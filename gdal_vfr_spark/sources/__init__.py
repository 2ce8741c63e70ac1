"""Sources/sinks layer (SURVEY.md §2.1 S1-S8)."""

from gdal_vfr_spark.sources.manifest import (  # noqa: F401
    batch_manifest,
    expand_date_interval,
    infer_default_date,
    resolve_file_names,
)
