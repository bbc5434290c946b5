#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the same
sfDir tables, then compares: columns sorted by name, rows sorted, values
stringified (floats via repr of rounded doubles). Reports per-query
row/schema/value match.
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

STRICT = "--strict" in sys.argv  # full-precision repr instead of 9 sig digits

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if STRICT:
            return "0.0" if v == 0.0 else repr(v)
        # collapse -0.0/0.0 and tiny fp residue beyond 9 significant digits
        return format(v, ".9g")
    if isinstance(v, bool):
        return str(int(v))
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return format(float(v), ".9g")
    except Exception:
        pass
    return str(v)

def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = sorted(tuple(canon(x) for x in row) for row in zip(*data)) if data else []
    return cols, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        got = pq.read_table(pdir)
        gcols, grows = table_rows(got)
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        wcols, wrows = table_rows(want)
        if gcols != wcols:
            print(f"FAIL {name}: schema {gcols} != {wcols}")
            n_fail += 1
            continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}")
            n_fail += 1
            continue
        bad = [(g, w) for g, w in zip(grows, wrows) if g != w]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first: GOT {bad[0][0]} WANT {bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(grows)} rows, {len(gcols)} cols")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
