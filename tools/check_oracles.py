"""Local replica of the driver's correctness gate: run every contract
query on Spark AND its DuckDB oracle at sf0.01, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import sys

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(x):
    import datetime
    import math

    if isinstance(x, float):
        if math.isnan(x):
            return "nan"
        return f"{x:.9g}"
    if isinstance(x, datetime.datetime):
        return x.isoformat()
    return str(x)


def norm_rows(cols, rows):
    # sort columns by name, then rows lexicographically (driver semantics)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main(names: list[str]) -> int:
    sys.path.insert(0, "/root/repo")
    from motive_rdf_spark.contract import registry
    from motive_rdf_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions="8")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    reg = registry()
    todo = names or sorted(reg)
    failures = 0
    for name in todo:
        fn, sql = reg[name]
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if sql is None:
            print(f"{name:28s} rows-only: {len(srows)} rows (no oracle)")
            continue
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        ok_cols = sc == dc
        ok_count = len(sr) == len(dr)
        ok_vals = sr == dr
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name:28s} {status} cols={ok_cols} count={len(sr)}/{len(dr)} vals={ok_vals}")
            if not ok_cols:
                print(f"   spark cols: {sc}\n   duck  cols: {dc}")
            if ok_cols and not ok_vals:
                diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
                only_s = [r for r in sr[:2000] if r not in set(dr[:2000])][:2]
                print(f"   first diffs: {diff}")
                print(f"   sample spark-only: {only_s}")
        else:
            print(f"{name:28s} OK    ({len(sr)} rows)")
    print(f"\n{len(todo) - failures}/{len(todo)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
