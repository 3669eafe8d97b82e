"""Driver simulation: run the ENTIRE contract the way the driver
does — a vanilla SparkSession (none of our factory confs), entry()
smoke, then every queries()[name] vs oracle_sql()[name] on DuckDB.

Catches queries that silently depend on get_spark() configuration.
Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import math
import sys
from pathlib import Path

import duckdb

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    spec = importlib.util.spec_from_file_location("__spark_entry__", ROOT / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    # VANILLA session — exactly what the driver might build
    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    rows = mod.entry(spark).collect()
    assert len(rows) > 0, "entry() returned no rows"
    print(f"entry: {len(rows)} rows ok")

    qs, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    from lakehouse_test_spark.session import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            n_fail += 1
            failures.append((name, f"spark: {str(e)[:140]}"))
            continue
        sql = oracles.get(name)
        if sql is None:
            n_rows_only += 1
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            n_fail += 1
            failures.append((name, f"duckdb: {str(e)[:140]}"))
            continue
        ok = len(srows) == len(orows) and sorted(scols) == sorted(ocols)
        if ok:
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ms = sorted("|".join(_norm(r[i]) for i in order_s) for r in srows)
            mo = sorted("|".join(_norm(r[i]) for i in order_o) for r in orows)
            ok = ms == mo
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            failures.append((name, "value/shape mismatch"))

    print(f"{n_pass} pass, {n_rows_only} rows-only, {n_fail} FAIL")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
