"""Time individual queries() entries at a given SF (perf triage helper).

Usage: python tools/time_queries.py [--sf DIR] [names...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

args = sys.argv[1:]
sf = "/root/testdata/sf0.1"
if args and args[0] == "--sf":
    sf = args[1]
    args = args[2:]

import __spark_entry__ as m
from cdc_debezium_kafka_airflow_spark.session import get_spark

spark = get_spark("probe")
spark.sparkContext.setLogLevel("ERROR")
qs = m.queries()
for name in args or sorted(qs):
    t0 = time.perf_counter()
    try:
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__} {str(e)[:200]}", flush=True)
