"""Scale probe for the distributed connected-components plan (stages/components.py).

Builds an adversarial synthetic graph — long chains (stress pointer jumping), hub
stars (key skew), and random dense blocks — forces the DISTRIBUTED Dataset plan, and
verifies the full label table against the vectorized local fixpoint. Records wall
time + round count evidence for BASELINE.md.

Usage: python tools/cc_scale_probe.py [n_edges] [num_cpus]
"""
import sys, time, json

sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
import ray

n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
import ray.data as rd

rd.DataContext.get_current().enable_progress_bars = False
from augdiff_pipeline_ray.stages import components as CC

rng = np.random.default_rng(42)
third = n_edges // 3

# 1) chains of length 10k (diameter stress: naive propagation needs 10k rounds,
#    pointer jumping needs ~log2(10k) ≈ 14)
chain_len = 10_000
n_chains = third // chain_len
base = np.arange(n_chains, dtype=np.int64)[:, None] * (chain_len + 1)
offs = np.arange(chain_len, dtype=np.int64)[None, :]
ca = (base + offs).ravel()
cb = ca + 1

# 2) stars: 100 hubs with third/100 spokes each (skewed degree)
hub_block = 100_000_000
n_hubs = 100
spokes = third // n_hubs
ha = np.repeat(np.arange(n_hubs, dtype=np.int64) * spokes + hub_block, spokes)
hb = ha + 1 + np.tile(np.arange(spokes, dtype=np.int64), n_hubs)

# 3) random edges over a 200k-node universe (many mid-size components)
rnd_block = 200_000_000
ra = rng.integers(0, 200_000, third).astype(np.int64) + rnd_block
rb = rng.integers(0, 200_000, third).astype(np.int64) + rnd_block

a = np.concatenate([ca, ha, ra])
b = np.concatenate([cb, hb, rb])
m = a != b
a, b = a[m], b[m]
print(f"edges={len(a):,} nodes~{len(np.unique(np.concatenate([a,b]))):,}")

t0 = time.time()
nodes_l, clus_l = CC.local_components_np(a, b)
t_local = time.time() - t0
print(f"local fixpoint: {t_local:.2f}s, {len(nodes_l):,} nodes, "
      f"{len(np.unique(clus_l)):,} components")

edges = pa.table({"a": pa.array(a), "b": pa.array(b)})
t0 = time.time()
out = CC.components_dataset(rd.from_arrow(edges).repartition(num_cpus))
t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow", batch_size=None)))
t_dist = time.time() - t0
idx = np.argsort(t["node"].to_numpy(zero_copy_only=False), kind="stable")
nodes_d = t["node"].to_numpy(zero_copy_only=False)[idx]
clus_d = t["cluster"].to_numpy(zero_copy_only=False)[idx]
ok = np.array_equal(nodes_d, nodes_l) and np.array_equal(clus_d, clus_l)
print(json.dumps({
    "edges": int(len(a)),
    "nodes": int(len(nodes_l)),
    "components": int(len(np.unique(clus_l))),
    "local_sec": round(t_local, 2),
    "distributed_sec": round(t_dist, 2),
    "num_cpus": num_cpus,
    "labels_match_local": bool(ok),
}))
assert ok, "distributed CC labels diverge from the local fixpoint"
ray.shutdown()
