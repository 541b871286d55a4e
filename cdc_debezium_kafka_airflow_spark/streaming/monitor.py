"""Live self-monitoring: the reference polls Kafka/Connect from Airflow side
channels (dags/kafka_latency_monitor.py); a Spark-native pipeline gets the
same numbers from the engine itself via StreamingQueryListener /
``lastProgress`` — no side consumer, no extra connection to the broker.

`ProgressCapture` accumulates per-micro-batch progress events;
`progress_metrics` turns them into the same metrics DataFrame shape the
batch `monitor_lag` query produces, so the alerting dataflow
(`lag_metrics` -> `any_failed`) is reused unchanged on live numbers.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressCapture(StreamingQueryListener):
    """Collects micro-batch progress (rows, duration, per-source offsets)."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "timestamp": p.timestamp,
                "num_input_rows": p.numInputRows,
                "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
                "sources": json.dumps(
                    [
                        {
                            "description": s.description,
                            "start_offset": str(s.startOffset),
                            "end_offset": str(s.endOffset),
                            "num_input_rows": s.numInputRows,
                        }
                        for s in p.sources
                    ]
                ),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def progress_metrics(spark: SparkSession, capture: ProgressCapture) -> DataFrame:
    """Progress events -> metrics DataFrame (one row per micro-batch)."""
    schema = (
        "query_id string, batch_id long, timestamp string, "
        "num_input_rows long, batch_duration_ms long, sources string"
    )
    return spark.createDataFrame(
        [tuple(d.values()) for d in capture.progress], schema
    )
