"""Shuffle-budget discipline: flagship queries must keep their documented number of
all-to-all operators. Every Sort/Aggregate/Join/Repartition is an exchange that moves
every block (SURVEY §4.2); these tests pin the executed plan shape so a refactor can't
silently reintroduce an extra shuffle (or a driver-side collect that hides one) into a
hot path. Counts are the final returned pipeline's — side passes that legitimately run
to completion first (sketch folds, threshold scans) are asserted by their own tests."""

from __future__ import annotations

import re

import pytest

SF = "/root/testdata/sf0.001"

_ALL_TO_ALL = re.compile(
    r"^\t?Operator \d+ (Sort|Aggregate|Repartition|Join|RandomShuffle)", re.M
)

# query name -> exact number of all-to-all operators in the final plan
EXPECTED = {
    "dedup_exact_docs": 1,       # one hash-group dedup, nothing else
    "curation_pipeline": 1,      # quality→lang→dedup→tokens: ONLY the dedup shuffles
    "pivot_counts": 1,           # pivot happens in the batch combiner
    "passage_dedup": 1,          # chunking + in-batch combine, one groupby
    "heavy_hitters": 1,          # sketch prune leaves one exact groupby
    "json_extract_agg": 1,       # extraction + pre-sum, tiny groupby
    "broadcast_join": 1,         # dims broadcast — only the output aggregate shuffles
    "quality_scores": 0,         # pure map pipeline
    "token_counts": 0,
    "bloom_semi_join": 0,        # bloom + exact check broadcast; no fact shuffle
    "stratified_sample": 0,      # hash-based rates, shuffle-free
    "histogram_value": 1,        # bincount combiner, one bin-cardinality groupby
    "set_intersect": 1,          # presence-flag combiner, one user-cardinality groupby
    "set_except": 1,             # same single-shuffle plan as set_intersect
    "running_total": 1,          # one hash sort per key; scan is in-group vectorized
    "full_outer_spenders": 5,    # 2 side aggregates + 2 empty-block repartitions + join
    # --- round-2 continuation operators (extra_queries.py) ---
    "duplicate_spans": 3,        # fingerprint count groupby + mark join + doc groupby
    #                              (gram pass recomputed per consumer by design)
    "triangle_count": 2,         # closing join + unpivot count in the FINAL lineage;
    #                              the edge/wedge sorted-block passes (2 sorts + the
    #                              pair/degree aggregates) run as materialized side
    #                              passes via to_arrow_refs (degree-oriented plan, r4)
    "watermark_window": 1,       # block scan is side-pass; only the window groupby
    "track_length": 1,           # one hash sort per track key
    "cell_ring_agg": 3,          # cnt groupby (materialized once) + ring groupby + join
    "zorder_layout": 0,          # morton sort + rank run in the zip_with_index side
    #                              pass; final plan is a pure map over stamped blocks
    "scd2_history": 1,           # one hash sort per business key
    "snapshot_diff": 1,          # ONE full-outer join over (key, value-hash) pairs
    "frequent_itemsets": 1,      # pair stream via sorted-block kernel (side-pass
    #                              sort) + ONE (x,y) support-count groupby
    "inverted_postings": 1,      # one token-keyed shuffle
    "pruned_read": 1,            # combiner + 3-row groupby; predicate at the source
    "tpch_q5": 3,                # exactly TWO large hash joins + 5-row groupby;
    #                              region/nation/supplier ride as broadcasts
    "track_area": 1,             # one hash sort per track key (same as track_length)
    "quantile_bins": 0,          # boundary histogram is an eager side pass; the
    #                              binning scan itself is shuffle-free
    "churn_gaps": 1,             # one hash sort per user key
    "bpe_pair_stats": 2,         # vocab groupby + pair-cardinality groupby;
    #                              corpus text scanned exactly once
    "bigram_likelihood": 1,      # scoring pass: broadcast model + per-doc groupby
    #                              (model train groupby is an eager side pass)
    "cdf_rank": 0,               # histogram side pass; rank stamp is a pure map
    "window_distinct": 2,        # (win,user) distinct-pair groupby + window fold
    "salted_hot_count": 2,       # (key,salt) partial groupby + tiny re-merge
    #                              (hot-key detection is an eager side pass)
    "per_stratum_sample": 1,     # k-per-stratum candidates, one stratum groupby
    "profile_table": 2,          # (column,cents) value-domain groupby + 4-group fold
    "douglas_peucker": 1,        # one hash sort per track key
    "segment_intersections": 1,  # one cell-keyed shuffle; canonical-cell rule
    #                              needs no distinct pass
    "negative_samples": 2,       # edge-distinct groupby (pair sort is side-pass)
    #                              + ONE left-anti rejection join
    "split_dedup_guard": 0,      # broadcast val fingerprints; pure scan
    "fk_violations": 1,          # four broadcast-membership scans + 4-row fold
    "stay_points": 1,            # one hash sort per track key
    "incremental_agg": 2,        # delta partial groupby + base∪delta merge
    #                              (base view aggregate is a one-time side pass)
    "dedup_cut_corpus": 0,       # dup-fingerprint set is an eager side pass +
    #                              broadcast; the cut/rebuild scan is shuffle-free
    "vocab_encode": 0,           # vocab groupby+sort are eager side passes;
    #                              final plan = stamped-block map (zip_with_index)
    "count_pyramid": 1,          # all three levels fold in one pass, one groupby
    "embedding_stats": 1,        # dim-cardinality partials, one 64-row groupby
    "track_profile": 1,          # length + area fused into ONE track-key shuffle
    "pixel_histogram": 1,        # 48-row partials per batch, one tiny groupby
    "sequence_patterns": 2,      # user-key shuffle + pattern-cardinality groupby
    "time_weighted_avg": 1,      # one hash sort per key
    "covisitation_topk": 2,      # (x,y) count + candidate topk (pair sort is
    #                              the side-pass sorted-block kernel)
    "k_anonymity": 1,            # one quasi-identifier combiner groupby
    "tile_augment": 0,           # pure actor-pool map; pixels never shuffle
    "str_pack": 0,               # both sorts + rank stamps are zip_with_index
    #                              side passes; final plan is a pure map
    "trend_per_user": 1,         # five integral sums per key, one groupby
    "convex_hull_track": 1,      # one hash sort per track key
    "dedup_recent": 1,           # one composite-key hash sort
    "ssl_corrupt": 1,            # ONE donor-lookup hash self-join
    "target_encode_loo": 0,      # category table broadcast; encode is a scan
    "training_shards": 0,        # sort + byte-prefix stamps run as side passes;
    #                              final plan is stamped blocks (two ints/block
    #                              to the driver)
    "kfold_assign": 0,           # sort + rank are zip_with_index side passes;
    #                              the fold stamp is pure arithmetic
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_shuffle_budget(ray_session, name):
    import ray.data as rd

    from augdiff_pipeline_ray.pipelines import extra_queries  # noqa: F401 — registers
    from augdiff_pipeline_ray.pipelines import tpch_queries as Q

    ds = Q.QUERIES[name](SF)
    assert isinstance(ds, rd.Dataset), f"{name} should return a streaming Dataset"
    ds = ds.materialize()
    ops = _ALL_TO_ALL.findall(ds.stats())
    assert len(ops) == EXPECTED[name], (
        f"{name}: expected {EXPECTED[name]} all-to-all operator(s), "
        f"plan has {len(ops)}: {ops}"
    )
