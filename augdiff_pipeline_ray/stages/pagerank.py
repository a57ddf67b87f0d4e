"""PageRank over the directed dependency-edge graph — iterative dataflow as Ray Data
hash joins, the fourth member of the graph-operator family (edges → transitive closure
→ connected components → PageRank).

Algorithm (public — Page et al. 1999, power iteration with damping): each round every
node scatters ``rank/out_degree`` along its out-edges, contributions are summed per
target, and ``rank' = (1-d)/N + d·(in_sum + dangling_mass/N)`` where dangling mass is
the total rank of nodes with no out-edges (redistributed uniformly — the standard
stochastic-matrix completion). Fixed iteration count (deterministic plan; PageRank's
geometric convergence makes 20 rounds ≈ 1e-6 L1 error at d = 0.85).

Two plans, auto-selected by edge count (the ``closure_auto`` / ``components_auto``
precedent):

* **local** — vectorized numpy power iteration over index-space ids (one
  ``np.add.at`` scatter per round). Right whenever the edge list fits one worker.
* **distributed** — ranks live in a Dataset keyed by node; each round is ONE hash
  join (edges ⨝ ranks on the source, shipping ``rank/deg`` per edge) and one
  ``groupby(dst).sum``. Out-degrees are computed once and pre-joined onto the edge
  table so the per-round join payload is a single float per edge. Dangling mass is
  a scalar aggregate per round. All shuffles hash-partition on the node id; nothing
  collects the edge list to the driver.

There is no reference-repo counterpart; the closest relative is the Pregel closure
(ComputeIndex.scala:19-40), which this module's per-round join+groupby shape mirrors.
Distributed == local equivalence is pinned by tests (float tolerance only for
cross-plan sum-order differences).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

DAMPING = 0.85
ROUNDS = 20


def pagerank_numpy(
    a: np.ndarray, b: np.ndarray, damping: float = DAMPING, rounds: int = ROUNDS
) -> tuple[np.ndarray, np.ndarray]:
    """Exact power iteration over edges a→b. Returns (nodes_sorted, rank)."""
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    n = len(nodes)
    if n == 0:
        return nodes, np.empty(0, np.float64)
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    deg = np.bincount(ai, minlength=n).astype(np.float64)
    dangling = deg == 0
    rank = np.full(n, 1.0 / n)
    for _ in range(rounds):
        contrib = rank[ai] / deg[ai]
        in_sum = np.zeros(n)
        np.add.at(in_sum, bi, contrib)
        dm = rank[dangling].sum()
        rank = (1.0 - damping) / n + damping * (in_sum + dm / n)
    return nodes, rank


def pagerank_dataset(
    edges: rd.Dataset,
    damping: float = DAMPING,
    rounds: int = ROUNDS,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed power iteration; ``edges`` has int64 columns (a, b) = link a→b.

    Returns a Dataset (node, rank). Each round: edges-with-degree ⨝ ranks on the
    source node (hash join), per-edge contribution, ``groupby(node).sum`` on the
    target — two all-to-alls per round, both keyed by node id.
    """
    from ray.data.aggregate import Count, Sum

    from .closure import default_join_partitions

    np_j = num_partitions or default_join_partitions()
    e = edges.select_columns(["a", "b"])

    # vertex table + out-degree, both computed once
    verts = (
        e.map_batches(
            lambda t: pa.table(
                {"node": pa.array(np.unique(
                    np.concatenate([
                        t["a"].to_numpy(zero_copy_only=False),
                        t["b"].to_numpy(zero_copy_only=False),
                    ])
                ))}
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )
    n = verts.count()
    deg = (
        e.map_batches(
            lambda t: pa.table({"node": t["a"]}), batch_format="pyarrow"
        )
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
    )
    # edge table annotated with the source's out-degree (joined ONCE, reused per round)
    ewd = e.rename_columns({"a": "node"}).join(
        deg, join_type="inner", num_partitions=np_j, on=("node",)
    ).materialize()

    ranks = verts.map_batches(
        lambda t: t.append_column("rank", pa.array(np.full(len(t), 1.0 / n))),
        batch_format="pyarrow",
    ).materialize()
    # dangling nodes (no out-edges): vertex anti-join on the degree table, kept as a
    # boolean column so the per-round dangling mass is one filtered sum
    dang = verts.join(
        deg, join_type="left_outer", num_partitions=np_j, on=("node",)
    ).map_batches(
        lambda t: pa.table(
            {"node": t["node"],
             "dangling": pa.array(
                 np.asarray(pa.compute.is_null(t["deg"]).to_numpy(zero_copy_only=False))
             )}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(rounds):
        dm = (
            dang.join(ranks, join_type="inner", num_partitions=np_j, on=("node",))
            .map_batches(
                lambda t: pa.table(
                    {"m": pa.array([
                        float(t["rank"].to_numpy(zero_copy_only=False)[
                            t["dangling"].to_numpy(zero_copy_only=False)
                        ].sum())
                    ])}
                ),
                batch_format="pyarrow",
            )
            .sum("m")
        )
        contrib = ewd.join(
            ranks, join_type="inner", num_partitions=np_j, on=("node",)
        ).map_batches(
            lambda t: pa.table(
                {"node": t["b"],
                 "c": pa.array(
                     t["rank"].to_numpy(zero_copy_only=False)
                     / t["deg"].to_numpy(zero_copy_only=False)
                 )}
            ),
            batch_format="pyarrow",
        )
        in_sum = contrib.groupby("node").aggregate(Sum("c", alias_name="c"))
        base = (1.0 - damping) / n + damping * dm / n

        ranks = verts.join(
            in_sum, join_type="left_outer", num_partitions=np_j, on=("node",)
        ).map_batches(
            lambda t, _base=base: pa.table(
                {"node": t["node"],
                 "rank": pa.array(
                     _base
                     + damping
                     * np.nan_to_num(
                         t["c"].to_numpy(zero_copy_only=False).astype(np.float64),
                         nan=0.0,
                     )
                 )}
            ),
            batch_format="pyarrow",
        ).materialize()
    return ranks


def pagerank_auto(
    edges: rd.Dataset, local_threshold: int = 2_000_000, **kw
) -> tuple[np.ndarray, np.ndarray]:
    """Size-adaptive plan selection (closure_auto precedent): the numpy power
    iteration under ``local_threshold`` edges, the Dataset plan above it. Returns
    (nodes_sorted, rank) either way."""
    if edges.count() <= local_threshold:
        import pyarrow.parquet  # noqa: F401  (keep import surface identical)

        tbl = pa.concat_tables(
            [pa.table(b) for b in edges.select_columns(["a", "b"]).iter_batches(
                batch_format="pyarrow"
            )]
        )
        return pagerank_numpy(
            tbl["a"].to_numpy(zero_copy_only=False),
            tbl["b"].to_numpy(zero_copy_only=False),
            **{k: v for k, v in kw.items() if k in ("damping", "rounds")},
        )
    out = pagerank_dataset(edges, **kw).to_pandas().sort_values("node")
    return out["node"].to_numpy(np.int64), out["rank"].to_numpy(np.float64)
