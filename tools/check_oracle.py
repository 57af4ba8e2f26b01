#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables, and compare with the
Spark result parquet written by graft.Verify — columns sorted by name, values
hash-compared. Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import duckdb, glob, json, sys, hashlib
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fail += 1; continue
    # Read the Spark output with pandas/pyarrow, NOT DuckDB: DuckDB collapses
    # DECIMAL to float64 on BOTH sides, masking representation mismatches
    # ("1.50" vs "1.5") that the driver's gate catches (r1 lesson: 7 queries
    # passed here while failing at the driver). pd.read_parquet (not raw
    # pq.read_table().to_pandas()) so date32 → datetime64, matching the
    # driver's stringification of DATE columns.
    sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    # Normalize date32→datetime64 to match DuckDB's DATE stringification
    # ('1998-11-02 00:00:00'); the driver accepts DATE outputs (q_date_arith
    # was green in r1) so only this — never decimals — may be coerced.
    import datetime
    for c in sdf.columns:
        if sdf[c].dtype == object:
            nn = sdf[c].dropna()
            if len(nn) and all(isinstance(v, datetime.date)
                               and not isinstance(v, datetime.datetime) for v in nn):
                sdf[c] = pd.to_datetime(sdf[c])
    o = odf[sorted(odf.columns)]
    s_cols = sorted(sdf.columns)
    if sorted(map(str.lower, odf.columns)) != sorted(map(str.lower, sdf.columns)):
        print(f"FAIL {name}: schema mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        fail += 1; continue
    s = sdf[s_cols]
    if len(o) != len(s):
        print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}"); fail += 1; continue
    def h(df):
        return hashlib.md5("\n".join(
            ",".join(str(v) for v in row) for row in df.itertuples(index=False)
        ).encode()).hexdigest()
    if h(o) != h(s):
        print(f"FAIL {name}: value hash mismatch ({len(o)} rows)")
        merged = o.compare(s) if list(o.columns) == list(s.columns) else None
        if merged is not None and not merged.empty:
            print(merged.head(5))
        fail += 1
    else:
        print(f"PASS {name} ({len(o)} rows)")
print(f"{'ALL PASS' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} oracle queries")
sys.exit(1 if fail else 0)
