"""Directory-served mock of Spark's Kafka SOURCE (test support).

The sandbox has no broker and no spark-sql-kafka connector jar, so
``format("kafka")`` normally fails to resolve. Spark 4's Python
DataSource registry is consulted when classpath lookup fails — so
registering THIS source under the name ``kafka`` makes
``sources/kafka.py``'s ``read_changelog_batch`` / ``read_changelog_stream``
execute their real code paths (format string, subscribePattern, offset
bounds, maxOffsetsPerTrigger) end-to-end in CI, with records served from
a local directory instead of a broker.

Wire contract: the directory holds one ``<topic>.jsonl`` file per topic;
each line is ``{"key": b64|null, "value": b64|null, "partition": int,
"offset": int, "timestamp_us": int}``. The mock emits rows in the EXACT
published Kafka source schema (kafka.KAFKA_SOURCE_DDL) and honors:

- ``kafka.bootstrap.servers`` — required; ``dir://<path>`` points at the
  serving directory (the mock's stand-in for a bootstrap string).
- ``subscribePattern`` — required; topics are regex-matched exactly as a
  broker subscription would (fullmatch on the topic name).
- ``startingOffsets``/``endingOffsets`` — only earliest/latest replay is
  modeled (what read_changelog_batch requests).
- ``maxOffsetsPerTrigger`` — stream admission cap per micro-batch.

This is a TEST DOUBLE: records are loaded driver-side (test corpora are
small) and shipped to executors inside the partition objects.
"""

from __future__ import annotations

import base64
import datetime
import json
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_UTC = datetime.timezone.utc


def _parse_dir(bootstrap: str) -> str:
    if not bootstrap.startswith("dir://"):
        raise ValueError(
            "mock kafka source: kafka.bootstrap.servers must be dir://<path>, "
            f"got {bootstrap!r}"
        )
    return bootstrap[len("dir://") :]


def _load_records(options: dict) -> list[tuple]:
    """All matching records as KAFKA_SOURCE_DDL tuples, ordered by
    (topic, partition, offset) — the deterministic replay order."""
    served_dir = _parse_dir(options["kafka.bootstrap.servers"])
    pattern = re.compile(options["subscribePattern"])
    rows: list[tuple] = []
    for fname in sorted(os.listdir(served_dir)):
        if not fname.endswith(".jsonl"):
            continue
        topic = fname[: -len(".jsonl")]
        if not pattern.fullmatch(topic):
            continue  # the subscription filter a broker would apply
        with open(os.path.join(served_dir, fname)) as fh:
            for line in fh:
                rec = json.loads(line)
                rows.append(
                    (
                        base64.b64decode(rec["key"])
                        if rec["key"] is not None
                        else None,
                        base64.b64decode(rec["value"])
                        if rec["value"] is not None
                        else None,
                        topic,
                        int(rec["partition"]),
                        int(rec["offset"]),
                        datetime.datetime.fromtimestamp(
                            rec["timestamp_us"] / 1e6, tz=_UTC
                        ).replace(tzinfo=None),
                        0,  # timestampType: CREATE_TIME
                    )
                )
    rows.sort(key=lambda r: (r[2], r[3], r[4]))
    return rows


class _RowsPartition(InputPartition):
    def __init__(self, rows: list[tuple]):
        self.rows = rows


class _MockKafkaBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        if options.get("startingOffsets", "earliest") != "earliest":
            raise ValueError("mock kafka source: only earliest is modeled")
        self._rows = _load_records(options)

    def partitions(self):
        # one Spark partition per (topic, partition) — the real source's
        # partitioning contract
        by_tp: dict[tuple, list[tuple]] = {}
        for r in self._rows:
            by_tp.setdefault((r[2], r[3]), []).append(r)
        return [_RowsPartition(v) for v in by_tp.values()] or [
            _RowsPartition([])
        ]

    def read(self, partition: _RowsPartition):
        yield from partition.rows


class _MockKafkaStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._rows = _load_records(options)
        cap = options.get("maxOffsetsPerTrigger")
        self._batch = int(cap) if cap is not None else max(1, len(self._rows))
        self._pos = 0

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        self._pos = min(self._pos + self._batch, len(self._rows))
        return {"pos": self._pos}

    def partitions(self, start: dict, end: dict):
        return [_RowsPartition(self._rows[start["pos"] : end["pos"]])]

    def read(self, partition: _RowsPartition):
        yield from partition.rows

    def commit(self, end: dict) -> None:
        pass


class MockKafkaDataSource(DataSource):
    """Registered as ``kafka_dir_mock``: Spark reserves the name "kafka"
    (DATA_SOURCE_ALREADY_EXISTS) even when the connector jar is absent,
    so tests point ``sources.kafka.KAFKA_FORMAT`` here instead — the
    reader functions and every option they set still execute for real."""

    @classmethod
    def name(cls) -> str:
        return "kafka_dir_mock"

    def schema(self) -> str:
        from cdc_debezium_kafka_airflow_spark.sources.kafka import (
            KAFKA_SOURCE_DDL,
        )

        return KAFKA_SOURCE_DDL

    def reader(self, schema) -> _MockKafkaBatchReader:
        return _MockKafkaBatchReader(self.options)

    def streamReader(self, schema) -> _MockKafkaStreamReader:
        return _MockKafkaStreamReader(self.options)


def serve_changelog(fixture_rows, served_dir: str) -> None:
    """Write fixture changelog rows (offset/topic/partition/key/value/
    timestamp) into the mock's per-topic JSONL layout, value/key encoded
    as the exact UTF-8 envelope bytes a JsonConverter producer publishes."""
    os.makedirs(served_dir, exist_ok=True)
    by_topic: dict[str, list] = {}
    for r in fixture_rows:
        by_topic.setdefault(r["topic"], []).append(r)
    for topic, rows in by_topic.items():
        with open(os.path.join(served_dir, f"{topic}.jsonl"), "w") as fh:
            for r in rows:
                ts = r["timestamp"]
                fh.write(
                    json.dumps(
                        {
                            "key": base64.b64encode(
                                r["key"].encode("utf-8")
                            ).decode("ascii")
                            if r["key"] is not None
                            else None,
                            "value": base64.b64encode(
                                r["value"].encode("utf-8")
                            ).decode("ascii")
                            if r["value"] is not None
                            else None,
                            "partition": r["partition"],
                            "offset": r["offset"],
                            "timestamp_us": int(
                                ts.replace(
                                    tzinfo=datetime.timezone.utc
                                ).timestamp()
                                * 1e6
                            ),
                        }
                    )
                    + "\n"
                )
