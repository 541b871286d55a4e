"""PySpark-native CDC + analytics engine.

A from-scratch, Spark-first re-implementation of the capabilities of the
reference repo ``jony96-lab/cdc-debezium-kafka-airflow`` (a Debezium → Kafka
→ JDBC-sink CDC pipeline with Airflow monitoring), extended with the
relational warehouse surface the reference delegates to Postgres and with
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Layout:
  sources/    table loaders, deterministic CDC-changelog + monitor fixtures,
              (gated) Kafka readers
  operators/  CDC envelope ops, monitoring dataflow, dedup, similarity,
              text analysis, multimodal plumbing
  streaming/  Structured Streaming twins of the batch CDC path
  queries/    the query registry exposed through __spark_entry__.py

Everything is DataFrame-first: logical plans are declared with the
DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy. Python
UDFs are avoided everywhere except the explicitly-stubbed multimodal decode
path (Arrow-batched ``mapInPandas``).
"""

__version__ = "0.1.0"
