"""Session verify: drive the driver contract (entry + queries vs DuckDB
oracles at sf0.01) exactly as /verify prescribes.  Prints one line per
query; any MISMATCH is a failure."""
import importlib
import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")
mod = importlib.import_module("__spark_entry__")
from filter_vectordb_spark import TABLES, get_spark

spark = get_spark("verify", cpus=16)
rows = mod.entry(spark).collect()
print("entry rows:", len(rows), flush=True)
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
bad = 0
for name, fn in mod.queries().items():
    try:
        left = fn(spark, SF).toPandas()
        sql = mod.oracle_sql().get(name)
        if sql is None:
            print(name, "rows-only:", len(left), flush=True)
            continue
        right = con.sql(sql).df()
        cols = sorted(left.columns)
        l = left[cols].sort_values(cols).reset_index(drop=True).astype(str)
        r = right[cols].sort_values(cols).reset_index(drop=True).astype(str)
        ok = cols == sorted(right.columns) and l.equals(r)
        print(name, "MATCH" if ok else "MISMATCH", flush=True)
        bad += 0 if ok else 1
    except Exception as exc:
        print(name, "ERROR", exc, flush=True)
        traceback.print_exc()
        bad += 1
spark.stop()
print("verify done, failures:", bad, flush=True)
sys.exit(1 if bad else 0)
