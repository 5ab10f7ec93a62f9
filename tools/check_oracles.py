#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB against the
testdata parquet tables, and compares: column names (sorted), row counts,
and values (sorted rows; floats to 1e-6 relative tolerance).

Dev tool only — the shipped Scala library has no Python dependency.
"""
import sys, json, math, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    return v


def rows_key(row):
    return tuple((str(type(x)), str(x)) for x in row)


def close(a, b):
    # STRICT by design: the driver's gate hashes exact values (columns
    # sorted by name), so any float tolerance here would pass locally and
    # fail the driver (this bit round 1: q_decimal / q_values_inline).
    if a is None or b is None:
        return a is b
    # int-on-one-side / float-on-the-other is a FAIL even when the values
    # are numerically equal: the driver hashes typed values, so a DuckDB
    # HUGEINT column (reaching pandas as float) against a Spark BIGINT
    # hashes differently (this bit round 9: text_bpe_train's un-cast
    # UNION ALL branches). Decimal-vs-float stays tolerated — the
    # driver's pandas path coerces DECIMAL to float64, so those DO hash
    # alike. Cast both sides to BIGINT in the oracle SQL instead.
    def is_int(x):
        return isinstance(x, int) and not isinstance(x, bool)
    if (is_int(a) and isinstance(b, float)) or \
       (is_int(b) and isinstance(a, float)):
        return False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output written")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            duck_rel = con.sql(sql)
            s_cols = sorted(spark_rel.columns)
            d_cols = sorted(duck_rel.columns)
            if s_cols != d_cols:
                print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
                n_fail += 1
                continue
            s_rows = sorted(
                (tuple(norm(r[spark_rel.columns.index(c)]) for c in s_cols)
                 for r in spark_rel.fetchall()), key=str)
            d_rows = sorted(
                (tuple(norm(r[duck_rel.columns.index(c)]) for c in d_cols)
                 for r in duck_rel.fetchall()), key=str)
            if len(s_rows) != len(d_rows):
                print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
                print("  spark sample:", s_rows[:3])
                print("  duck  sample:", d_rows[:3])
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(s_rows, d_rows)
                   if not all(close(x, y) for x, y in zip(a, b))]
            if bad:
                print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first:")
                print("  spark:", bad[0][0])
                print("  duck :", bad[0][1])
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s_rows)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} oracled queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
