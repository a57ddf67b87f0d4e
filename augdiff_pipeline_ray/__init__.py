"""augdiff_pipeline_ray — a from-scratch Ray-Data-native augmented-diff + spatial-tiling engine.

Re-expresses the semantics of azavea/augdiff-pipeline (Scala/Spark/GraphX, see
/root/repo/SURVEY.md for the full structural analysis) as idiomatic Ray Data pipelines:
``ray.data.Dataset`` → ``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages (index shards, STRtrees, tile decoders), ``groupby``/``sort`` shuffles for the wide
steps, streaming execution end-to-end, per-(batch, cell) lineage checkpoints for resume.

Nothing here calls ``ray.init()`` — the driver owns the Ray session.
"""

__version__ = "0.1.0"


def _register_pickle_by_value() -> None:
    """Ship this package to Ray workers by value.

    The engine runs from a plain source checkout (never pip-installed), and the Ray
    session is owned by the caller — so workers can't be assumed to have the repo on
    ``sys.path``. Registering every submodule with cloudpickle's by-value mode makes
    actor classes and module-level batch functions serialize self-contained; no
    ``runtime_env`` / PYTHONPATH coordination needed. The modules are small (pure code +
    constant tables), so the per-task overhead is negligible.
    """
    import importlib

    from ray import cloudpickle

    submodules = [
        "keys", "cells", "georef", "schemas", "heap",
        "functions", "functions.geom", "functions.scalar", "functions.osm",
        "functions.assembly", "functions.text", "functions.dedup",
        "functions.similarity", "functions.image", "functions.png",
        "functions.jpeg", "functions.sketch",
        "sources", "sources.osc", "sources.snapshot", "sources.geojson",
        "stages", "stages.edges", "stages.closure", "stages.augment",
        "stages.render", "stages.tiles", "stages.shuffle", "stages.components",
        "stages.pagerank", "stages.raster",
        "state", "state.index_store", "state.strtree", "state.lineage",
        "state.tile_pool",
        "pipelines", "pipelines.worldgen", "pipelines.indexer", "pipelines.adiff",
        "pipelines.tpch", "pipelines.tpch_queries",
    ]
    for name in submodules:
        try:
            mod = importlib.import_module(f"{__name__}.{name}")
        except ImportError:
            continue  # optional module not present yet
        cloudpickle.register_pickle_by_value(mod)


_register_pickle_by_value()
