from data_engineering_project_spark.plans.medallion import (  # noqa: F401
    StarSchemaSpec,
    TESTDATA_SPEC,
    build_star_schema,
)
