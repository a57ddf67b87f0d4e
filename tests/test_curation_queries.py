"""Brute-force invariants for the LLM-curation additions (decontaminate /
pii_redact / gopher_quality / seq_pack / phash_dup_clusters). The DuckDB oracle
compare is the primary gate (tools/check_oracles.py, driver CORRECTNESS); these
pin the distributed plans against independent pandas/numpy/re re-derivations so
a refactor that breaks a combiner or the broadcast path fails fast in pytest."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _df(x):
    import ray

    if isinstance(x, ray.data.Dataset):
        x = x.to_pandas()
    elif isinstance(x, pa.Table):
        x = x.to_pandas()
    return x


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_decontaminate_matches_string_grams(ray_session, docs):
    """The hashed-gram broadcast membership == literal string-gram membership."""
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_decontaminate

    out = _df(q_decontaminate(SF)).sort_values("doc_id").reset_index(drop=True)

    def grams(txt):
        ws = txt.split(" ")
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    bench = set()
    for _, r in docs.iterrows():
        if r.doc_id % 199 == 3:
            bench |= grams(r.text)
    exp = {
        int(r.doc_id): int(bool(grams(r.text) & bench))
        for _, r in docs.iterrows()
        if r.doc_id % 199 != 3
    }
    assert set(out.doc_id) == set(exp)  # benchmark docs excluded
    got = dict(zip(out.doc_id, out.contaminated))
    assert got == exp
    # non-degenerate on this corpus: both branches exercised
    assert 0 < sum(exp.values()) < len(exp)


def test_pii_redact_matches_re(ray_session, docs):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_pii_redact

    out = _df(q_pii_redact(SF)).sort_values("doc_id").reset_index(drop=True)
    pat = re.compile(r"\b(key|hash|user)\b")
    d = docs.sort_values("doc_id").reset_index(drop=True)
    exp_red = d["text"].map(lambda t: pat.sub("[PII]", t))
    exp_n = d["text"].map(lambda t: len(pat.findall(t)))
    assert out["redacted"].tolist() == exp_red.tolist()
    assert out["n_hits"].tolist() == exp_n.tolist()
    assert int(out["n_hits"].sum()) > 0
    # every hit is gone from the redacted text
    assert not any(pat.search(t) for t in out["redacted"])


def test_gopher_quality_matches_counter(ray_session, docs):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_gopher_quality

    out = _df(q_gopher_quality(SF)).sort_values("doc_id").reset_index(drop=True)
    d = docs.sort_values("doc_id").reset_index(drop=True)
    for col, fn in [
        ("n_words3", lambda ws: len(ws)),
        ("top_word_count", lambda ws: max(Counter(ws).values())),
        ("n_bigrams", lambda ws: max(len(ws) - 1, 0)),
        (
            "dup_bigram_tokens",
            lambda ws: sum(
                c for c in Counter(zip(ws, ws[1:])).values() if c >= 2
            ),
        ),
    ]:
        exp = d["text"].map(lambda t: fn(t.split(" ")))
        assert out[col].tolist() == exp.tolist(), col


def test_seq_pack_offsets_and_continuity(ray_session, docs):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_seq_pack

    out = _df(q_seq_pack(SF)).sort_values("doc_id").reset_index(drop=True)
    assert (out["seq_offset"] < 512).all() and (out["seq_offset"] >= 0).all()
    # per group: cumulative-token re-derivation reproduces (seq_id, offset) exactly
    out["grp"] = out["doc_id"] // 64
    for grp, g in out.groupby("grp"):
        g = g.sort_values("doc_id")
        before = np.cumsum(g["n_tok"].to_numpy(np.int64)) - g["n_tok"].to_numpy(np.int64)
        assert (g["seq_id"].to_numpy(np.int64) == grp * 4096 + before // 512).all()
        assert (g["seq_offset"].to_numpy(np.int64) == before % 512).all()
        # sequence ids are dense within the group (no gaps: every seq gets content)
        locals_ = np.unique(g["seq_id"].to_numpy(np.int64) - grp * 4096)
        assert (locals_ == np.arange(len(locals_))).all()


def test_phash_dup_clusters_vs_bruteforce(ray_session, docs):
    """Band-LSH + CC labels == exhaustive-Hamming-pairs + brute CC labels."""
    from augdiff_pipeline_ray.functions.dedup import hamming64
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_phash_dup_clusters

    out = _df(q_phash_dup_clusters(SF)).sort_values("doc_id").reset_index(drop=True)
    d = np.sort(docs["doc_id"].to_numpy(np.int64))
    ph = ((d // 4) * 1103515245 + 12345) % 2147483648
    m = d % 4
    for j in range(3):
        pos = (m * 7 + j * 13) % 31
        ph = np.where(m >= j + 1, ph ^ (np.int64(1) << pos), ph)
    ii, jj = np.triu_indices(len(d), k=1)
    keep = hamming64(ph[ii], ph[jj]) <= 3
    # brute union-find
    parent = {int(x): int(x) for x in d}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(d[ii[keep]], d[jj[keep]]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {int(x): find(int(x)) for x in d}
    got = dict(zip(out.doc_id, out.cluster_id))
    assert got == exp
    # the planted families exist and are non-trivial: every doc shares its
    # family's cluster with the family base member
    fam = out.groupby(out["doc_id"] // 4)["cluster_id"].nunique()
    assert (fam == 1).all()
    assert (out["cluster_id"] <= out["doc_id"]).all()
