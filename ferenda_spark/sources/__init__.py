from ferenda_spark.sources.pages import synth_pages, read_table, write_table  # noqa: F401
from ferenda_spark.sources.office import read_office, decode_office  # noqa: F401
from ferenda_spark.sources.png import decode_png, encode_png  # noqa: F401
