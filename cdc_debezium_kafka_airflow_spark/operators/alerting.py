"""Alert sink — the engine-side model of the reference's EmailOperator
notifications (dags/cdc_health_check_dag.py:71-84, integrity DAG :65-76):
failures fan into a single alert with a templated body.

The transport (SMTP at docker-compose.yml:42-48) is an out-of-engine side
effect, so `AlertSink` renders and RECORDS alerts; a deployment subclasses
`deliver` to actually send. Used as a `foreachBatch` callback on a
mismatch/critical-lag DataFrame — the streaming-native replacement for the
reference's TriggerRule.ONE_FAILED -> email task chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class Alert:
    subject: str
    body: str
    n_failures: int


@dataclass
class AlertSink:
    """Collects rendered alerts; override `deliver` for a real transport."""

    subject_template: str = "[CDC ALERT] {n} failing check(s)"
    sent: list[Alert] = field(default_factory=list)

    def deliver(self, alert: Alert) -> None:
        self.sent.append(alert)

    def process_batch(self, failures: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch callback: one alert per non-empty failure batch."""
        rows = failures.collect()
        if not rows:
            return
        lines = [
            ", ".join(f"{k}={r[k]}" for k in failures.columns) for r in rows
        ]
        self.deliver(
            Alert(
                subject=self.subject_template.format(n=len(rows)),
                body="\n".join(lines),
                n_failures=len(rows),
            )
        )

    def foreach_batch(self):
        """Adapter usable directly as writeStream.foreachBatch(...)."""

        def fn(batch: DataFrame, batch_id: int) -> None:
            self.process_batch(batch, batch_id)

        return fn
