"""All-gate oracle dry run: run every queries() entry and compare
row-count / schema / value-hash against oracle_sql() via DuckDB,
mirroring the driver's CORRECTNESS check.

Usage (run from the repo root so Ray workers can import the package):
    python scripts/oracle_check.py [sf_dir] [only_query1,only_query2]

Last full run 2026-08-19: 50/50 clean at sf0.01 (46 match, 4
no_oracle approximate-by-design, 0 err)."""
import hashlib
import json
import sys
import time

import duckdb
import pandas as pd
import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def vhash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        pd.util.hash_pandas_object(norm(df), index=False).values.tobytes()
    ).hexdigest()


def to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)  # Ray workers inherit cwd for package imports
sys.path.insert(0, REPO)
ray.init(address="local", num_cpus=16, include_dashboard=False)
import __ray_entry__ as e

qs = e.queries()
osql = e.oracle_sql()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

results = {}
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        rdf = to_df(fn(SF))
        dt = time.time() - t0
        if name in osql:
            odf = con.execute(osql[name]).fetchdf()
            rn, on_ = norm(rdf), norm(odf)
            ok_rows = len(rn) == len(on_)
            ok_schema = list(rn.columns) == list(on_.columns)
            ok_hash = ok_rows and ok_schema and vhash(rdf) == vhash(odf)
            results[name] = {
                "status": "match" if ok_hash else "MISMATCH",
                "rows": len(rn),
                "oracle_rows": len(on_),
                "schema_ok": ok_schema,
                "sec": round(dt, 2),
            }
        else:
            results[name] = {"status": "no_oracle", "rows": len(rdf), "sec": round(dt, 2)}
    except Exception as ex:
        results[name] = {"status": "ERR", "err": f"{type(ex).__name__}: {ex}"[:200]}
    r = results[name]
    print(f"{name:32s} {r['status']:10s} {r.get('rows','-')!s:>8s} {r.get('sec','')}", flush=True)

bad = {k: v for k, v in results.items() if v["status"] in ("MISMATCH", "ERR")}
print(json.dumps({"total": len(results), "bad": bad}, indent=1))
ray.shutdown()
