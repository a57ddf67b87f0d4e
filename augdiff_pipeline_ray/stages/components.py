"""Connected components over an undirected edge list — the cluster step of near-dup
deduplication (candidate pairs from minhash/simhash/jaccard → one canonical id per
duplicate component).

Algorithm (public): min-label propagation with pointer jumping (path halving) — each
round every node takes the minimum label among itself, its neighbours, and its label's
label. With the jump step the label forest halves in depth per round, so the fixpoint
arrives in O(log n) rounds on any graph (Shiloach & Vishkin 1982; the shuffle-based
formulation follows Kiveris et al. 2014, "Connected Components in MapReduce and
Beyond"). There is no reference-repo counterpart — the closest relative is the
transitive closure (stages/closure.py, ComputeIndex.scala:19-94), but components are
undirected and want a single representative, not reachability pairs.

Two plans, auto-selected by input size (the ``closure_auto`` precedent):

* **local** — the same fixpoint vectorized in one numpy process over index-space
  labels (``np.minimum.at`` over the edge arrays + ``lab = lab[lab]`` jumps). Right
  whenever the edge list fits one worker; dedup pair tables are output-sized, so this
  covers every sandbox scale.
* **distributed** — labels live in a Dataset keyed by node; each round is one hash
  join (symmetric edges ⨝ labels, propagating the neighbour label), a ``groupby(node)
  .min(lab)`` merge, and one label⨝label join for the pointer jump. Convergence is
  detected with a scalar ``sum(lab)``: labels only ever decrease, so the sum strictly
  decreases until the fixpoint — one cheap aggregate per round instead of a change
  join. All shuffles are hash-partitioned on the node id; nothing ever collects the
  edge list to the driver. After each round the edge set is CONTRACTED into label
  space (two joins + distinct): edges internal to an already-agreed component become
  self-loops and vanish, so the dominant per-round cost — re-joining the full edge
  table — shrinks geometrically; once the super-graph is empty, the remaining rounds
  are label-table-only pointer jumps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def local_components_np(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact connected components of the undirected graph {a[i] — b[i]}.

    Returns ``(nodes, cluster)`` sorted by node: ``cluster[i]`` is the minimum node id
    in ``nodes[i]``'s component. Only nodes present in the edge list appear; callers
    union singletons themselves (a node with no edges is its own cluster).
    """
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    if len(a) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    lab = np.arange(len(nodes), dtype=np.int64)
    # min-label + path-halving fixpoint; strictly decreasing labels → terminates
    for _ in range(2 * int(np.ceil(np.log2(len(nodes) + 1))) + 4):
        old = lab
        lab = lab.copy()
        np.minimum.at(lab, ai, lab[bi])
        np.minimum.at(lab, bi, lab[ai])
        lab = lab[lab]
        if np.array_equal(lab, old):
            break
    else:  # pragma: no cover - the bound above is loose; never hit in practice
        while True:
            old = lab
            lab = lab.copy()
            np.minimum.at(lab, ai, lab[bi])
            np.minimum.at(lab, bi, lab[ai])
            lab = lab[lab]
            if np.array_equal(lab, old):
                break
    return nodes, nodes[lab]


def _edges_symmetric(edges: rd.Dataset) -> rd.Dataset:
    """(a, b) edge rows → both directions as (src, lab-carrier dst)."""

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    return edges.map_batches(sym, batch_format="pyarrow")


def _retab(t: pa.Table, mapping: dict[str, str]) -> pa.Table:
    """Project/rename ``in_name → out_name`` with a GUARANTEED int64 schema even for
    the schema-less empty blocks hash shuffles emit for unpopulated partitions (Acero
    joins reject zero-column blocks with 'No match for key field')."""
    if t.num_rows == 0:
        return pa.table({o: pa.array([], pa.int64()) for o in mapping})
    return pa.table({o: t[i] for o, i in mapping.items()})


def components_dataset(
    edges: rd.Dataset,
    num_partitions: int | None = None,
    max_rounds: int = 60,
) -> rd.Dataset:
    """Distributed components: Dataset in (columns ``a``, ``b``) → Dataset out
    (columns ``node``, ``cluster``), one row per distinct node in the edge list."""
    from ray.data.aggregate import Min

    from .closure import default_join_partitions

    np_j = num_partitions or default_join_partitions()
    sym = _edges_symmetric(edges).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()), "lab": pa.array([], pa.int64())})
        n = np.unique(t["src"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(n), "lab": pa.array(n)})

    # per-block unique then a groupby-min collapses cross-block duplicates.
    # The repartition()s below are load-bearing: hash aggregates emit ZERO-COLUMN
    # empty blocks for unpopulated partitions, map_batches passes empty blocks through
    # WITHOUT calling the UDF, and Dataset.join crashes ('No match or multiple matches
    # for key field') whenever such a block is the first shard a join aggregator sees.
    # repartition() concat-normalizes blocks, dropping the schema-less empties.
    labels = (
        sym.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("lab", alias_name="lab"))
        .map_batches(lambda t: _retab(t, {"node": "node", "lab": "lab"}), batch_format="pyarrow")
        .repartition(np_j)
        .materialize()
    )
    prev_sum = labels.sum("lab")
    sym_rows = sym.count()
    for _ in range(max_rounds):
        if sym_rows:
            # propagate: every edge offers its src's current label to its dst
            lab_by_src = labels.map_batches(
                lambda t: _retab(t, {"src": "node", "plab": "lab"}), batch_format="pyarrow"
            )
            cand = sym.join(lab_by_src, join_type="inner", num_partitions=np_j, on=("src",))
            cand = cand.map_batches(
                lambda t: _retab(t, {"node": "dst", "lab": "plab"}), batch_format="pyarrow"
            )
            merged = (
                labels.union(cand)
                .groupby("node")
                .aggregate(Min("lab", alias_name="lab"))
                .map_batches(
                    lambda t: _retab(t, {"node": "node", "lab": "lab"}), batch_format="pyarrow"
                )
                .repartition(np_j)  # join input: must be free of zero-column empties
                .materialize()
            )
        else:
            merged = labels  # edge set fully contracted away; only jumps remain
        # pointer jump: lab ← lab's lab (labels are node ids, every lab has a row)
        jump_side = merged.map_batches(
            lambda t: _retab(t, {"lab": "node", "jlab": "lab"}), batch_format="pyarrow"
        )
        jumped = merged.join(jump_side, join_type="inner", num_partitions=np_j, on=("lab",))
        labels = (
            jumped.map_batches(
                lambda t: _retab(t, {"node": "node", "lab": "jlab"}), batch_format="pyarrow"
            )
            .repartition(np_j)  # next round's join input
            .materialize()
        )
        cur_sum = labels.sum("lab")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        if sym_rows:
            # CONTRACTION (Kiveris et al. 2014 family): rewrite the edge set into
            # label space with the freshly-jumped labels. Edges internal to an
            # already-agreed component become self-loops and vanish, so the biggest
            # table in the loop shrinks geometrically — later rounds touch only the
            # not-yet-merged super-graph instead of re-joining all E edges forever.
            lab_s = labels.map_batches(
                lambda t: _retab(t, {"src": "node", "slab": "lab"}), batch_format="pyarrow"
            )
            lab_d = labels.map_batches(
                lambda t: _retab(t, {"dst": "node", "dlab": "lab"}), batch_format="pyarrow"
            )
            e1 = sym.join(lab_s, join_type="inner", num_partitions=np_j, on=("src",))
            e2 = e1.map_batches(
                lambda t: _retab(t, {"dst": "dst", "slab": "slab"}), batch_format="pyarrow"
            ).join(lab_d, join_type="inner", num_partitions=np_j, on=("dst",))

            def canon(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return pa.table(
                        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
                    )
                s = t["slab"].to_numpy(zero_copy_only=False)
                d = t["dlab"].to_numpy(zero_copy_only=False)
                keep = s != d
                s, d = s[keep], d[keep]
                # canonical undirected pair + per-block dedup before the shuffle
                arr = np.stack([np.minimum(s, d), np.maximum(s, d)], axis=1)
                arr = np.unique(arr, axis=0) if len(arr) else arr.reshape(0, 2)
                return pa.table({"src": pa.array(arr[:, 0]), "dst": pa.array(arr[:, 1])})

            contracted = (
                e2.map_batches(canon, batch_format="pyarrow")
                .groupby(["src", "dst"])
                .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
                .map_batches(
                    lambda t: _retab(t, {"a": "src", "b": "dst"}), batch_format="pyarrow"
                )
            )
            sym = _edges_symmetric(contracted).repartition(np_j).materialize()
            sym_rows = sym.count()
    return labels.map_batches(
        lambda t: _retab(t, {"node": "node", "cluster": "lab"}), batch_format="pyarrow"
    )


def components_auto(
    edges: rd.Dataset | pa.Table | "np.ndarray",
    local_threshold: int = 5_000_000,
    num_partitions: int | None = None,
) -> pa.Table | rd.Dataset:
    """Size-adaptive plan: edge lists under ``local_threshold`` rows run the vectorized
    local fixpoint (returns a pa.Table), larger ones the Dataset loop (returns a
    Dataset). Mirrors ``closure_auto``'s contract."""
    if isinstance(edges, pa.Table):
        n = edges.num_rows
        if n <= local_threshold:
            nodes, clu = local_components_np(
                edges["a"].to_numpy(zero_copy_only=False),
                edges["b"].to_numpy(zero_copy_only=False),
            )
            return pa.table({"node": pa.array(nodes), "cluster": pa.array(clu)})
        edges = rd.from_arrow(edges)
        return components_dataset(edges, num_partitions=num_partitions)
    ds = edges.materialize()
    if ds.count() <= local_threshold:
        t = pa.concat_tables(
            list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
        )
        nodes, clu = local_components_np(
            t["a"].to_numpy(zero_copy_only=False), t["b"].to_numpy(zero_copy_only=False)
        )
        return pa.table({"node": pa.array(nodes), "cluster": pa.array(clu)})
    return components_dataset(ds, num_partitions=num_partitions)
