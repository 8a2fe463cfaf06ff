"""Sources & sinks: bronze CSV lake, silver/gold Parquet, JDBC, watermarks."""

from de_final_project_spark.sources.readers import (  # noqa: F401
    read_ingest_table,
    read_parquet_table,
    read_testdata,
)
from de_final_project_spark.sources.sinks import (  # noqa: F401
    write_csv_batch,
    write_parquet_overwrite,
)
from de_final_project_spark.sources.watermark import WatermarkStore  # noqa: F401
