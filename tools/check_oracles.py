"""Driver-style oracle compare: run every queries() entry and its DuckDB oracle
side-by-side over an sf dir, compare rows + schema + order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""
import sys, json, hashlib
sys.path.insert(0, "/root/repo")
import duckdb, pandas as pd, numpy as np, pyarrow as pa
import ray
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
only = sys.argv[2:] if len(sys.argv) > 2 else None
ray.init(address="local", num_cpus=16, include_dashboard=False, ignore_reinit_error=True,
         logging_level="ERROR")
import __ray_entry__ as E
Q = E.queries(); O = E.oracle_sql()
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def norm(df):
    if isinstance(df, ray.data.Dataset): df = df.to_pandas()
    elif isinstance(df, pa.Table): df = df.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df

def vhash(df):
    parts = []
    for c in df.columns:
        s = df[c]
        if s.dtype == object: parts.append(s.astype(str))
        elif np.issubdtype(s.dtype, np.floating): parts.append(s.round(6).astype(str))
        else: parts.append(s.astype(str))
    cat = pd.concat(parts, axis=1).agg("|".join, axis=1) if len(df) else pd.Series([], dtype=str)
    return hashlib.sha256("\n".join(cat).encode()).hexdigest()

res = {}
names = only or list(Q.keys())
if "adiff_stream" in names:
    # the flagship resumes lineage-committed batches — a stale work dir would make
    # the golden check hash OLD bytes and miss a regression; force a fresh run
    import os as _os, shutil as _shutil
    _h = hashlib.md5(_os.path.abspath(sf).encode()).hexdigest()[:10]
    _shutil.rmtree(f"/tmp/augdiff_flagship_{_h}", ignore_errors=True)
for name in names:
    try:
        mine = norm(Q[name](sf))
        if name in O:
            orc = norm(con.execute(O[name]).df())
            rows = len(mine) == len(orc)
            schema = list(mine.columns) == list(orc.columns)
            h = vhash(mine) == vhash(orc) if rows and schema else False
            res[name] = {"rows": rows, "schema": schema, "hash": h, "n": len(mine), "n_orc": len(orc)}
            flag = "OK " if (rows and schema and h) else "FAIL"
        elif name == "adiff_stream":
            # golden-checked (VERDICT r3 #6): the flagship's raw ndjson output must
            # byte-match the committed multi-batch golden for this sf dir
            import os
            from pathlib import Path

            h = hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:10]
            adir = Path(f"/tmp/augdiff_flagship_{h}/out/adiff")
            sha = hashlib.sha256()
            for p in sorted(adir.rglob("*.ndjson")):
                sha.update(str(p.relative_to(adir)).encode() + b"\0")
                sha.update(p.read_bytes())
            digest = sha.hexdigest()
            gpath = Path("/root/repo/tests/goldens/adiff_stream_sha.json")
            want = json.loads(gpath.read_text()) if gpath.exists() else {}
            key = os.path.basename(os.path.normpath(sf))
            if key in want:
                ok = want[key] == digest
                res[name] = {"rows": True, "schema": True, "hash": ok,
                             "golden": True, "n": len(mine), "n_orc": len(mine)}
                flag = "OK " if ok else "FAIL"
            else:
                res[name] = {"rows_only": len(mine), "golden_sha": digest}
                flag = "ro "
        else:
            res[name] = {"rows_only": len(mine)}
            flag = "ro "
        print(f"{flag} {name}: {res[name]}", flush=True)
    except Exception as e:
        print(f"ERR {name}: {type(e).__name__}: {e}", flush=True)
        res[name] = {"err": str(e)}
bad = [k for k,v in res.items() if v.get("err") or (("hash" in v) and not v["hash"])]
print("BAD:", bad)
ray.shutdown()
