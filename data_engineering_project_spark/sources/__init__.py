from data_engineering_project_spark.sources.csv import read_csv  # noqa: F401
from data_engineering_project_spark.sources.parquet import (  # noqa: F401
    read_parquet,
    read_testdata,
    write_parquet,
)
