"""CLI entry points — parity with the reference's two CommandApps (§2.8).

Reference: ``Indexer`` (indexer/src/main/scala/Indexer.scala:14-60; options: orcfile,
postgres*, external) and ``AugmentedDiffApp`` (ad/src/main/scala/AugmentedDiff.scala:
166-237; options: osctemplate, jsontemplate, range, postgres*, external). Postgres
options collapse into the index root (the sharded Parquet index replaces Postgres).

Usage (the process owns its Ray session — guarded init):

    python -m augdiff_pipeline_ray.cli indexer --snapshot w/snapshot.parquet --out out/
    python -m augdiff_pipeline_ray.cli adiff --world w/ --out out/ --range 1,-1
    python -m augdiff_pipeline_ray.cli worldgen --out w/ --grid 12 --images 256

The reference's third entry point — ``osc2json`` (one micro-batch,
AugmentedDiff.scala:95-159) — is ``adiff --range N,N``: the same parse → closure →
augment → render → sinks path for exactly one sequence number, idempotent by lineage.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, ignore_reinit_error=True)
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data as rdata

    rdata.DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="augdiff-ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_idx = sub.add_parser("indexer", help="snapshot → index + partitioned store")
    p_idx.add_argument("--snapshot", required=True, help="snapshot parquet (the 'orcfile')")
    p_idx.add_argument("--out", required=True, help="output root (the 'external' location)")
    p_idx.add_argument("--shards", type=int, default=8)

    p_ad = sub.add_parser("adiff", help="stream minutely change batches → ndjson + assignments")
    p_ad.add_argument("--world", required=True, help="world root (snapshot/images/changes)")
    p_ad.add_argument("--out", required=True)
    p_ad.add_argument("--range", default="1,-1", help="start,end sequence numbers (-1 = all)")
    p_ad.add_argument("--shards", type=int, default=8)
    p_ad.add_argument("--no-reference-compat", action="store_true",
                      help="load tags from storage (disable the reference's tag-drop quirk)")
    p_ad.add_argument("--osctemplate", default=None,
                      help="OSC source template with AAA/BBB/CCC sequence segments "
                           "(reference --osctemplate); any read_osc_file URI scheme "
                           "(file/http(s)/s3/hdfs, gz/bz2 sniffed); requires an "
                           "explicit --range end")
    p_ad.add_argument("--jsontemplate", default=None,
                      help="ndjson output template with AAA/BBB/CCC sequence segments "
                           "(reference --jsontemplate); plain path or file/s3/hdfs/gs URI; "
                           "default <out>/adiff/AAA/BBB/CCC.ndjson")

    p_wg = sub.add_parser("worldgen", help="write a deterministic synthetic world")
    p_wg.add_argument("--out", required=True)
    p_wg.add_argument("--grid", type=int, default=12)
    p_wg.add_argument("--images", type=int, default=256)
    p_wg.add_argument("--batches", type=int, default=6)
    p_wg.add_argument("--seed", type=int, default=42)

    args = ap.parse_args(argv)

    if args.cmd == "worldgen":
        from .pipelines import worldgen as W

        cfg = W.WorldConfig(seed=args.seed, grid=args.grid, n_images=args.images,
                            n_batches=args.batches)
        info = W.write_world(args.out, cfg)
        print(json.dumps({k: v for k, v in info.items() if k != "config"}))
        return 0

    _ray_session(args.num_cpus)
    import ray

    try:
        if args.cmd == "indexer":
            from .pipelines.indexer import run_indexer

            stats = run_indexer(args.snapshot, args.out, num_shards=args.shards)
            print(json.dumps(stats))
        elif args.cmd == "adiff":
            from .pipelines.adiff import AdiffJob

            start_s, end_s = args.range.split(",")
            job = AdiffJob(args.world, args.out, num_shards=args.shards,
                           drop_tags_on_load=not args.no_reference_compat,
                           adiff_template=args.jsontemplate,
                           osc_template=args.osctemplate)
            try:
                end = None if end_s == "-1" else int(end_s)
                stats = job.run_stream(start=int(start_s), end=end)
                print(json.dumps({"batches": len(stats["batches"]),
                                  "skipped": stats["skipped"], "end": stats["end"]}))
            finally:
                job.close()
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
