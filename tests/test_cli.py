"""CLI entry points driven at the process boundary — the `ray job submit` contract.

Each invocation is a fresh process that owns its own Ray session (the CLI guards
ray.init and shuts down on exit), exactly how a cluster job driver runs it; the
second adiff invocation must resume from lineage and skip every committed batch.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])


def _cli(*args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "augdiff_pipeline_ray.cli", "--num-cpus", "4", *args],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()[-1]


def test_cli_worldgen_adiff_and_lineage_resume(tmp_path):
    world = tmp_path / "world"
    out = tmp_path / "out"

    info = json.loads(_cli("worldgen", "--out", str(world), "--grid", "8",
                           "--images", "64", "--batches", "2"))
    assert (world / "snapshot.parquet").exists() and (world / "changes").is_dir()

    stats = json.loads(_cli("adiff", "--world", str(world), "--out", str(out),
                            "--range", "1,2"))
    assert stats["batches"] == 2 and stats["skipped"] == []
    assert (out / "lineage" / "batch-000000001.parquet").exists()
    assert (out / "lineage" / "batch-000000002.parquet").exists()
    adiff_files = list((out / "adiff").rglob("*.ndjson"))
    assert adiff_files, "adiff ndjson outputs missing"

    # resubmitting the identical job must skip both committed batches (resume contract)
    before = {p: p.stat().st_mtime_ns for p in adiff_files}
    stats2 = json.loads(_cli("adiff", "--world", str(world), "--out", str(out),
                             "--range", "1,2"))
    assert stats2["batches"] == 0 and stats2["skipped"] == [1, 2]
    after = {p: p.stat().st_mtime_ns for p in adiff_files}
    assert before == after, "resume must not rewrite committed outputs"
