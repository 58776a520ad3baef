from torcdb_spark.plans.explain import assert_pushed_filters, explain_str, shuffle_count

__all__ = ["explain_str", "shuffle_count", "assert_pushed_filters"]
