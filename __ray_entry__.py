"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline — the full augmented-diff stream over the
tpch-derived world at sf0.001 (index bootstrap → minutely change batches → closure →
semi-join fetch → render → tile assignment) and returns the emitted feature rows.

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
training-data additions as ``(sf_dir) -> Dataset | DataFrame | Table`` callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each SQL-expressible one
(column names match exactly). Registry: augdiff_pipeline_ray/pipelines/
tpch_queries.py + extra_queries.py (shared ``@query`` decorator).

Ray is initialised by the driver BEFORE this module is imported: nothing here (nor in
the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows >= 0."""
    from augdiff_pipeline_ray.pipelines import tpch as TP

    return TP.run_flagship(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from augdiff_pipeline_ray.pipelines import extra_queries  # noqa: F401 — registers
    from augdiff_pipeline_ray.pipelines import tpch_queries as Q

    out: dict[str, Callable[[str], Any]] = dict(Q.QUERIES)

    # the streaming adiff itself (stateful, multi-batch; no single SQL equivalent)
    def adiff_stream(sf_dir: str):
        from augdiff_pipeline_ray.pipelines import tpch as TP

        return TP.run_flagship(sf_dir)

    out["adiff_stream"] = adiff_stream
    return out


def oracle_sql() -> dict[str, str]:
    from augdiff_pipeline_ray.pipelines import extra_queries  # noqa: F401 — registers
    from augdiff_pipeline_ray.pipelines import tpch_queries as Q

    return dict(Q.ORACLE_SQL)
