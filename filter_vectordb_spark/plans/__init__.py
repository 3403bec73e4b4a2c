from filter_vectordb_spark.plans.audit import (  # noqa: F401
    assert_broadcast_join,
    assert_partition_pruned,
    assert_pushed_filters,
    assert_whole_stage_codegen,
    physical_plan,
)
