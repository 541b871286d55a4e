"""Per-job decomposition of a single queries() entry (perf triage helper).

Runs NAME twice (cold, warm) at --sf with the noop sink and prints, for the
warm run, each scheduled job's wall time and first-stage name, so "where do
the seconds go" is read off the status tracker instead of guessed.

Usage: python tools/profile_query.py [--sf DIR] name [name...]
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

args = sys.argv[1:]
sf = "/root/testdata/sf0.1"
if args and args[0] == "--sf":
    sf = args[1]
    args = args[2:]

import __spark_entry__ as m
from cdc_debezium_kafka_airflow_spark.session import get_spark

spark = get_spark("profile")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
tracker = sc.statusTracker()
qs = m.queries()


def run(name: str) -> float:
    t0 = time.perf_counter()
    qs[name](spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def frontier(start: int) -> int:
    i = start
    while tracker.getJobInfo(i) is not None:
        i += 1
    return i


for name in args:
    t_cold = run(name)
    spark.catalog.clearCache()
    j0 = frontier(0)
    t_warm = run(name)
    j1 = frontier(j0)
    print(f"\n=== {name}: cold {t_cold:.2f}s, warm {t_warm:.2f}s, "
          f"{j1 - j0} jobs (warm) ===")
    jvm = sc._jsc.sc().statusStore()
    for jid in range(j0, j1):
        try:
            jd = jvm.job(jid)
            sub = jd.submissionTime().get().getTime()
            done = jd.completionTime().get().getTime()
            desc = (jd.description().isDefined()
                    and jd.description().get() or jd.name())
            print(f"  job {jid}: {(done - sub) / 1000.0:7.3f}s  "
                  f"{str(desc)[:110]}")
        except Exception as e:
            print(f"  job {jid}: ? ({type(e).__name__})")
    spark.catalog.clearCache()
