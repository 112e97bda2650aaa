#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir]

Runs DuckDB on oracle_sql.json written by graft.Verify and compares each
query's parquet output (column names, dtypes, values). Exact compare after
sorting columns by name; floats compared with tiny tolerance to surface
real mismatches without ulp noise.
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        # read the Spark output with pandas/pyarrow (decimal columns stay
        # decimal.Decimal with exact scale) — the driver does the same;
        # reading through duckdb would coerce DECIMAL to float64 and hide
        # exact-rendering mismatches like r7's q34
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
        n_fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
    ok = True
    for c in got.columns:
        g, e = got[c], exp[c]
        if str(g.dtype) != str(e.dtype):
            print(f"WARN {name}.{c}: dtype {g.dtype} vs {e.dtype}")
        try:
            if g.dtype.kind == "f" or e.dtype.kind == "f":
                same = np.isclose(g.astype(float), e.astype(float),
                                  rtol=1e-9, atol=1e-9, equal_nan=True).all()
            else:
                same = g.astype(str).equals(e.astype(str))
        except Exception as ex:
            same = g.astype(str).equals(e.astype(str))
        if not same:
            bad = (g.astype(str) != e.astype(str))
            idx = bad[bad].index[:3].tolist()
            print(f"FAIL {name}.{c}: first diffs at rows {idx}: "
                  f"got {g.iloc[idx[:1]].tolist() if idx else '?'} "
                  f"exp {e.iloc[idx[:1]].tolist() if idx else '?'}")
            ok = False
    if ok:
        n_pass += 1
        print(f"PASS {name} ({len(got)} rows)")
    else:
        n_fail += 1
print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)
