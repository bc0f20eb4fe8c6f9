from .write import write_partition_overwrite  # noqa: F401
