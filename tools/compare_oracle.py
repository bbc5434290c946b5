#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [--strict] [--tol=R]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the same
sfDir tables, then compares: columns sorted by name, rows sorted, values
stringified (floats via repr of rounded doubles). Reports per-query
row/schema/value match.

--tol=R adds a fallback for queries whose exact (9-sig-digit) compare fails:
rows are re-aligned on a coarser 6-sig-digit sort key and floats accepted at
relative error <= R. Those queries report PASS_TOL. Use for scale passes
(e.g. sf1, 100x the gate's rows) where Spark's partial-aggregation order and
DuckDB's differ and non-associative float sums drift past the 9th digit; the
driver gate itself never uses it.
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

TOL = 0.0
for a in sys.argv:
    if a.startswith("--tol="):
        TOL = float(a.split("=", 1)[1])

def raw_rows_coarse(tbl):
    """Rows as raw python values, sorted by a 6-sig-digit key so that rows
    differing only in float least-digits align across engines."""
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    def key(row):
        return tuple(format(v, ".6g") if isinstance(v, float) and not math.isnan(v)
                     else canon(v) for v in row)
    return sorted(zip(*data), key=key) if data else []

def rows_match_tol(got, want):
    """Pairwise compare after coarse alignment: non-floats exact (canon),
    floats at relative error <= TOL. Returns (n_bad, first_bad)."""
    g, w = raw_rows_coarse(got), raw_rows_coarse(want)
    if len(g) != len(w):
        return len(g) + len(w), None
    bad = 0
    first = None
    for gr, wr in zip(g, w):
        ok = True
        for a, b in zip(gr, wr):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a == b:
                    continue
                if abs(a - b) > TOL * max(abs(a), abs(b)):
                    ok = False
                    break
            elif canon(a) != canon(b):
                ok = False
                break
        if not ok:
            bad += 1
            if first is None:
                first = (gr, wr)
    return bad, first

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table (e.g. GenScale output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
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
        if bad and TOL > 0:
            nbad, first = rows_match_tol(got, want)
            if nbad == 0:
                print(f"PASS_TOL {name}: {len(grows)} rows, {len(gcols)} cols "
                      f"({len(bad)} rows within rel {TOL:g} of exact)")
                n_pass += 1
                continue
            print(f"FAIL {name}: {nbad}/{len(grows)} rows differ beyond rel "
                  f"{TOL:g}; first: GOT {first[0]} WANT {first[1]}")
            n_fail += 1
        elif bad:
            print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first: GOT {bad[0][0]} WANT {bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(grows)} rows, {len(gcols)} cols")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
