"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry through Spark and its ``oracle_sql()`` twin
through DuckDB at the given SF, then compares row count, column names, and
the order-insensitive multiset of values (exact compare; floats must match
bit-for-bit after both sides' explicit ROUNDs — that is the determinism
contract, see __spark_entry__.py).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # BIT-level compare (not ==): the driver hashes formatted values,
        # so -0.0 vs 0.0 — equal under float compare — is a driver
        # mismatch. struct-packing makes the local gate exactly as strict.
        import struct

        return ("f", struct.pack("<d", v))
    if v is None:
        return ("n",)
    return ("s", str(v))


def row_key(row):
    return tuple(normalize(v) for v in row)


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    issues = []
    if sorted(spark_cols) != sorted(duck_cols):
        issues.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return issues
    if len(spark_rows) != len(duck_rows):
        issues.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = sorted(row_key([r[i] for i in order]) for r in spark_rows)
    d = sorted(row_key([r[i] for i in dorder]) for r in duck_rows)
    if s != d:
        n_diff = sum(1 for a, b in zip(s, d) if a != b) + abs(len(s) - len(d))
        issues.append(f"values: {n_diff} differing rows (of {max(len(s), len(d))})")
        for a, b in list(zip(s, d))[:2000]:
            if a != b:
                issues.append(f"  spark: {a}")
                issues.append(f"  duck : {b}")
                break
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from oasysdb_spark.session import get_spark

    spark = get_spark(app_name="check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows={len(spark_rows)})")
            continue
        try:
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        issues = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        dt = time.time() - t0
        if issues:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s, {len(spark_rows)} rows)")
            for i in issues:
                print(f"   {i}")
        else:
            n_pass += 1
            print(f"PASS {name} ({dt:.1f}s, {len(spark_rows)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
