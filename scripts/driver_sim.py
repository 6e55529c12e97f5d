#!/usr/bin/env python
"""Mirror of the driver's correctness gate, runnable locally.

Drives __spark_entry__ exactly as the harness does — plain
SparkSession, entry() smoke, then every queries() entry compared
against its oracle_sql() with DuckDB at sf0.01 (column set, row
count, canonicalized values).  Usage:

    python scripts/driver_sim.py [sf_dir] [query_name ...]

With query names given, only those registry entries are checked (the
fast loop for verifying one operator's rewrite against its oracle).
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def canon(df):
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("<null>")
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    return cols, sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod

    print("entry rows:", entry_mod.entry(spark).count())
    qs, orc = entry_mod.queries(), entry_mod.oracle_sql()
    if only:
        unknown = only - qs.keys()
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}
    print(f"queries: {len(qs)}  oracles: {len(orc)}")

    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    fails = 0
    t0 = time.perf_counter()
    for name, fn in qs.items():
        try:
            got = fn(spark, sf_dir).toPandas()
            if name in orc:
                ok = canon(got) == canon(con.execute(orc[name]).df())
                kind = "sql"
            else:
                ok = len(got) >= 0 and len(got.columns) > 0
                kind = "rows-only"
            print(("PASS" if ok else "FAIL"), name, f"({kind}, {len(got)} rows)")
            fails += not ok
        except Exception as exc:  # noqa: BLE001
            # Py4JJavaError carries the JVM stack in str(), not repr()
            print("ERROR", name, str(exc)[:4000])
            fails += 1
    print(f"TOTAL FAILS: {fails}/{len(qs)}  wall={time.perf_counter() - t0:.0f}s")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
