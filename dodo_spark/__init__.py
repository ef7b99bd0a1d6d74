"""dodo_spark — a PySpark-native analytics engine with the capabilities of
Thearas/dodo (reference: /root/reference, read-only).

The reference is a Go CLI toolchain for Apache Doris workload engineering;
query execution there is delegated to a Doris server. Here, Spark *is* the
execution backend: every relational operator of the (Spark-derived) Doris
grammar runs as a Catalyst plan, and dodo's own local dataflows — column
stats, audit-log scan, data generation, replay bookkeeping, diff,
anonymization — are re-expressed as DataFrame programs.

Layout
------
- ``session``    SparkSession factory tuned for scale (AQE, broadcast, Arrow)
- ``catalog``    test-table loading / view registration
- ``ddl``        Doris DDL -> StructType translator
- ``registry``   verify-key registry consumed by ``__spark_entry__.py``
- ``operators/`` relational ops, stats, dedup, similarity, text, events
- ``sources/``   audit-log scan, export writers
- ``gendata/``   type-driven data generation (reference src/generator)
- ``plans/``     replay scheduling + result hashing + diff
- ``streaming/`` Structured Streaming variants of the event operators
- ``anonymize``  SQL identifier anonymization pass
- ``multimodal`` binary-column (image/audio) plumbing with stubbed codecs
"""

__version__ = "0.1.0"
