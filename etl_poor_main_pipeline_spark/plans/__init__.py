from .explain import assert_no_python_udf, explain_str, has_partition_filter, pushed_filters  # noqa: F401
