from osarchiver_spark.plans.jobspec import ArchiveJobSpec, TableSpec
from osarchiver_spark.plans.toposort import sort_tables
from osarchiver_spark.plans.schema_drift import SchemaDriftError, check_schema_drift

__all__ = [
    "ArchiveJobSpec",
    "TableSpec",
    "sort_tables",
    "SchemaDriftError",
    "check_schema_drift",
]
