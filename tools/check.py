#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json on DuckDB over the
<sf_dir> parquet tables, and compares the way the driver does: both
sides into pandas, columns sorted by name, rows sorted by all columns
(pandas sort_values — this CRASHES on array-typed cells, exactly like
the driver's comparator, so array outputs must be serialized to
strings), then cell values compared dtype-sensitively (int64 vs
float64 is a mismatch, like the driver's value hash; DuckDB HUGEINT
becomes float64 in pandas and must be CAST to BIGINT in oracle SQL).
"""
import glob, json, sys, math
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pyarrow.types as pat


def unstable_dtypes(out_path, rel):
    """Driver-hash-unstable output types (round-9 lesson: this replica
    reads BOTH sides through DuckDB, so representational divergence the
    driver sees is invisible here unless we flag it structurally).

    The driver reads the Spark parquet via pyarrow (decimal128 ->
    decimal.Decimal, an 'other' kind) but the DuckDB oracle side via
    .df() (DECIMAL -> float64). So ANY decimal-typed output column on
    either side hashes asymmetrically even when the values are
    numerically identical — exactly what red-flagged
    fuzz_decimal_bank_1/2 in CORRECTNESS_r09 while this replica said
    pass. Same class as the HUGEINT note above: canonicalize in the
    query (CAST AS DOUBLE, or a fixed-format string), don't ship the
    raw wide type. Returns [(col, side, type), ...]."""
    bad = []
    files = glob.glob(f"{out_path}/*.parquet")
    if files:
        schema = pq.read_schema(files[0])
        for f in schema:
            if pat.is_decimal(f.type):
                bad.append((f.name, "spark", str(f.type)))
    if rel is not None:
        for name, t in zip(rel.columns, rel.types):
            if "DECIMAL" in str(t).upper():
                bad.append((name, "oracle", str(t)))
    return bad

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Driver-style canonical form: columns sorted by name, rows sorted by
    all columns. Raises (like the driver) if a cell is unhashable."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def kind(v):
    """Dtype class that must agree between engines (mirrors the driver's
    type-sensitive hash): ints and floats are distinct kinds."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    return "other"


def vals_equal(a, b):
    ka, kb = kind(a), kind(b)
    if ka != kb:
        return False
    if ka == "null":
        return True
    if ka == "float":
        fa, fb = float(a), float(b)
        return (math.isnan(fa) and math.isnan(fb)) or fa == fb
    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(b, (list, tuple, np.ndarray)):
        a = list(a) if isinstance(a, (list, tuple, np.ndarray)) else [a]
        b = list(b) if isinstance(b, (list, tuple, np.ndarray)) else [b]
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
            got = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable/unsortable: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            unstable = unstable_dtypes(f"{out_dir}/{name}", rel)
            if unstable:
                det = ", ".join(f"{c} [{s}] {t}" for c, s, t in unstable)
                print(f"FAIL {name}: driver-hash-unstable dtype (decimal output "
                      f"hashes pyarrow-Decimal vs duckdb-float64): {det}")
                n_fail += 1
                continue
            exp = canon(rel.df())
        except Exception as e:
            print(f"FAIL {name}: oracle error/unsortable: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns differ spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount spark={len(got)} duck={len(exp)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            rg, re_ = got.iloc[i], exp.iloc[i]
            for c in got.columns:
                if not vals_equal(rg[c], re_[c]):
                    bad = (i, c, rg[c], re_[c])
                    break
            if bad:
                break
        if bad:
            i, c, vg, ve = bad
            print(f"FAIL {name}: row {i} col {c} differs\n  spark={vg!r} ({type(vg).__name__})\n  duck ={ve!r} ({type(ve).__name__})")
            n_fail += 1
        else:
            n_pass += 1
    # Rows-only queries (no oracle SQL): the driver still loads + sorts the
    # output in pandas, so an unsortable (array-celled) output is a red row.
    import os
    extra = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path) or name in oracle:
            continue
        extra += 1
        try:
            df = canon(con.sql(f"SELECT * FROM '{path}/*.parquet'").df())
            if len(df) == 0:
                print(f"WARN {name}: rows-only output is empty")
        except Exception as e:
            print(f"FAIL {name}: rows-only output unreadable/unsortable: {str(e).splitlines()[0]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracle)} oracle + {extra} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
