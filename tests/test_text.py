"""Text-operator unit tests (spread_scan et al.)."""


def test_spread_scan_conditional(spark):
    """spread_scan repartitions a below-core-count input up to core count
    (single-split local files serialize per-doc kernels) and is a NO-OP
    when the source already has >= cores partitions (at warehouse scale
    file splits provide the parallelism — no shuffle added)."""
    from dodo_spark.operators.text import spread_scan

    p = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    assert spread_scan(narrow).rdd.getNumPartitions() == p
    wide = spark.range(100).repartition(p + 4)
    out = spread_scan(wide)
    assert out.rdd.getNumPartitions() == p + 4
    assert out is wide  # no-op returns the input plan unchanged
