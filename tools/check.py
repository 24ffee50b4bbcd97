#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json on DuckDB over the
<sf_dir> parquet tables, and compares: schema (column names), row count,
and exact values (columns sorted by name, rows in produced order).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Rows → list of tuples with columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return out, [cols[i] for i in order]


def vals_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(vals_equal(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        g, gc = canon(got_rows, got_cols)
        e, ec = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} duck={ec}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        bad = None
        for i, (rg, re_) in enumerate(zip(g, e)):
            if not all(vals_equal(x, y) for x, y in zip(rg, re_)):
                bad = (i, rg, re_)
                break
        if bad:
            i, rg, re_ = bad
            print(f"FAIL {name}: row {i} differs\n  spark={rg}\n  duck ={re_}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracle)} total ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
