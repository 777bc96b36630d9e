#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads Verify.scala output (outDir/<name>/ parquet + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf directory, and compares: column names
(sorted), row counts, and cell values (rows sorted). Exits non-zero on any
mismatch. Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures, passed, rows_only = [], [], []
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))]
    for name in names:
        table = ds.dataset(os.path.join(out_dir, name), format="parquet").to_table()
        if name not in oracle:
            rows_only.append((name, table.num_rows))
            if table.num_rows == 0:
                failures.append((name, "rows-only check: 0 rows"))
            continue
        try:
            want = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        got_cols, want_cols = sorted(table.column_names), sorted(want.column_names)
        if got_cols != want_cols:
            failures.append((name, f"columns differ: spark={got_cols} duckdb={want_cols}"))
            continue
        # The driver's hash gate is representation-sensitive: compare Arrow
        # types too (DuckDB SUM(BIGINT) widens to HUGEINT int128 — values
        # equal, hash not).
        got_types = {c: str(table.schema.field(c).type) for c in got_cols}
        want_types = {c: str(want.schema.field(c).type) for c in want_cols}
        skew = {c: (got_types[c], want_types[c]) for c in got_cols
                if got_types[c] != want_types[c]}
        if skew:
            failures.append((name, f"arrow type skew (driver hash will differ): {skew}"))
            continue

        def key(row):  # None-safe total order (NULL group keys etc.)
            return tuple((v is None, str(type(v)), v if v is not None else 0)
                         for v in row)
        g = sorted((tuple(norm(row[c]) for c in got_cols) for row in table.to_pylist()), key=key)
        w = sorted((tuple(norm(row[c]) for c in want_cols) for row in want.to_pylist()), key=key)
        if len(g) != len(w):
            failures.append((name, f"row count: spark={len(g)} duckdb={len(w)}"))
            continue
        bad = [(a, b) for a, b in zip(g, w) if a != b]
        if bad:
            failures.append((name, f"{len(bad)}/{len(g)} rows differ; first: spark={bad[0][0]} duckdb={bad[0][1]}"))
        else:
            passed.append((name, len(g)))
    for name, n in passed:
        print(f"PASS  {name} ({n} rows)")
    for name, n in rows_only:
        print(f"ROWS  {name} ({n} rows, no oracle)")
    for name, msg in failures:
        print(f"FAIL  {name}: {msg}")
    missing = set(oracle) - set(names)
    for m in sorted(missing):
        print(f"FAIL  {m}: oracle present but no spark output")
    print(f"\n{len(passed)} pass, {len(rows_only)} rows-only, {len(failures) + len(missing)} fail")
    sys.exit(1 if failures or missing else 0)

if __name__ == "__main__":
    main()
