from .read import load_table, load_tables, read_events, read_partition, read_table  # noqa: F401
