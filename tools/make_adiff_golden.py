"""Freeze the adiff_stream golden: run the flagship at the given sf dirs and
record the sha256 of the raw multi-batch ndjson output (file-name-salted) into
tests/goldens/adiff_stream_sha.json. The sweep (tools/check_oracles.py) then
asserts byte-equality against this committed golden — feature-level regressions
surface in the driver check, not only in pytest (VERDICT r3 #6).

Usage: python tools/make_adiff_golden.py [sf_dir ...]
"""
import hashlib
import json
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import ray


def golden_for(sf: str) -> str:
    from augdiff_pipeline_ray.pipelines import tpch as TP

    h = hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:10]
    work = Path(f"/tmp/augdiff_flagship_{h}")
    shutil.rmtree(work, ignore_errors=True)  # golden comes from a FRESH run
    TP.run_flagship(sf)
    adir = work / "out" / "adiff"
    sha = hashlib.sha256()
    for p in sorted(adir.rglob("*.ndjson")):
        sha.update(str(p.relative_to(adir)).encode() + b"\0")
        sha.update(p.read_bytes())
    return sha.hexdigest()


def main() -> None:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    gpath = Path("/root/repo/tests/goldens/adiff_stream_sha.json")
    gpath.parent.mkdir(parents=True, exist_ok=True)
    cur = json.loads(gpath.read_text()) if gpath.exists() else {}
    for sf in sfs:
        key = os.path.basename(os.path.normpath(sf))
        cur[key] = golden_for(sf)
        print(key, cur[key], flush=True)
    gpath.write_text(json.dumps(cur, indent=1, sort_keys=True) + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
