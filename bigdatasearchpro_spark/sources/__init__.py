from bigdatasearchpro_spark.sources.files import load_table, load_tables  # noqa: F401
from bigdatasearchpro_spark.sources.jdbc import jdbc_full_scan  # noqa: F401
