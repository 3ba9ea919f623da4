from ferenda_spark.sources.pages import synth_pages, read_table, write_table  # noqa: F401
