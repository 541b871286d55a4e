"""Capture .explain('formatted') for queries() entries into files.

Usage: python tools/capture_plan.py OUTDIR SUFFIX name [name...]
Writes OUTDIR/<name>_<SUFFIX>.txt. For snk_pydatasource_dlq the interesting
plan is the DLQ write branch (the returned frame is just the JSONL
read-back), so that query captures the write-branch plan instead.
"""

import os
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

outdir, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
os.makedirs(outdir, exist_ok=True)

import __spark_entry__ as m
from cdc_debezium_kafka_airflow_spark.session import get_spark

spark = get_spark("plans")
spark.sparkContext.setLogLevel("ERROR")
qs = m.queries()


def formatted(df):
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def frame_for(name):
    if name == "snk_pydatasource_dlq@write_branch":
        from cdc_debezium_kafka_airflow_spark.operators.cdc import (
            hoist_field,
            parse_envelope,
            split_dlq,
        )
        from cdc_debezium_kafka_airflow_spark.sources.cdc_fixture import (
            build_changelog,
        )
        from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

        return hoist_field(
            split_dlq(
                parse_envelope(
                    build_changelog(
                        load_table(spark, "/root/testdata/sf0.1", "events")
                    )
                )
            )[1]
        )
    return qs[name](spark, "/root/testdata/sf0.1")


for name in names:
    df = frame_for(name)
    fname = name.replace("@", "_")
    with open(os.path.join(outdir, f"{fname}_{suffix}.txt"), "w") as fh:
        fh.write(formatted(df))
    print("wrote", fname, suffix)
