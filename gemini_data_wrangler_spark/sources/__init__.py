from gemini_data_wrangler_spark.sources.readers import (
    TESTDATA_TABLES,
    dataframe_from_rows,
    load_sf_tables,
    read_csv,
    read_parquet,
)

__all__ = [
    "TESTDATA_TABLES",
    "dataframe_from_rows",
    "load_sf_tables",
    "read_csv",
    "read_parquet",
]
