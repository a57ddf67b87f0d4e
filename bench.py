"""Benchmark harness — the per-round feedback loop.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "adiff_rows_per_sec": ..., ...}

``--scaling`` runs the same bench twice in fresh processes (8 then 32 CPUs) on the same
input and reports both wall times plus scaling efficiency ``eff = (t8/t32)/(32/8)`` —
the sandbox evidence for the north rule's N→4N cluster criterion (see BASELINE.md).

Components:
* ``index_bootstrap`` — snapshot → edges → transitive closure → sharded index +
  partitioned store + tile decode/assign (the Indexer entry point)
* ``adiff_stream`` — K minutely batches through the full augmented-diff pipeline
  (headline: adiff feature rows + tile assignments per second)
* heavy operator queries: partial-agg pushdown, minhash dedup, cosine top-k, kNN,
  window aggregate, PIP cell assignment
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import logging

    import pyarrow.parquet as pq
    import ray
    import ray.data as rdata

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    rdata.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from augdiff_pipeline_ray.pipelines import adiff as AD
    from augdiff_pipeline_ray.pipelines import tpch as TP
    from augdiff_pipeline_ray.pipelines import tpch_queries as Q

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    work = tempfile.mkdtemp(prefix="augdiff_bench_")
    world = os.path.join(work, "world")
    out = os.path.join(work, "out")

    # warm the page cache so we measure compute + shuffle, not first disk read
    for t in ("part", "orders", "lineitem", "customer", "documents", "embeddings", "events"):
        pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))

    t0 = time.perf_counter()
    TP.build_world(sf_dir, world, n_batches=3)
    timings["worldgen"] = time.perf_counter() - t0

    job = AD.AdiffJob(world, out)
    t0 = time.perf_counter()
    job.bootstrap()
    timings["index_bootstrap"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    stats = job.run_stream()
    t_stream = time.perf_counter() - t0
    timings["adiff_stream"] = t_stream
    job.close()

    n_features = sum(b["features"] for b in stats["batches"])
    n_assign = sum(b["features"] for b in stats["batches"])  # one assignment per feature
    n_tiles = len(pq.read_table(os.path.join(out, "tile_assignments_base.parquet")))
    extras["adiff_features"] = n_features
    extras["tile_assignments"] = n_tiles + n_assign
    extras["adiff_rows_per_sec"] = round((n_features + n_assign) / max(t_stream, 1e-9), 2)

    for name in (
        "agg_pushdown",
        "events_window",
        "cell_assign",
        "minhash_dup_pairs",
        "cosine_topk",
        "knn_tiles",
        "closure",
    ):
        fn = Q.QUERIES[name]
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        timings[name] = time.perf_counter() - t0
        extras[f"{name}_rows"] = len(res)

    shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()

    total = sum(timings.values())
    return {
        "metric": "adiff rows + tile assignments/sec over the derived image snapshot "
        "with minutely change batches (headline suite wall time)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        **extras,
    }


def run_scaling(sf_dir: str) -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = one(lo)
    r_hi = one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    result = {
        "metric": "scaling efficiency, identical job at 8 vs 32 CPUs (fresh processes)",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "throughput_8": round(1.0 / r_lo["value"], 6),
        "throughput_32": round(1.0 / r_hi["value"], 6),
        "scaling_efficiency": round(eff, 3),
        "adiff_rows_per_sec_8": r_lo.get("adiff_rows_per_sec"),
        "adiff_rows_per_sec_32": r_hi.get("adiff_rows_per_sec"),
        "sf": sf_dir,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_latest.json", "w") as f:
        json.dump({"lo": r_lo, "hi": r_hi, "summary": result}, f, indent=2)
    return result


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, num_cpus)))
