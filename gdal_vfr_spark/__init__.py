"""gdal_vfr_spark — a PySpark-native spatial-join + tiling engine.

Re-grounds the semantics of ctu-geoforall-lab/gdal-vfr (RUIAN VFR ETL:
layer feature counts, geometry-validity checks, change merges,
point-in-polygon containment carried as FK columns) as DataFrame
operators over Common-Crawl-style web-page tables, per SURVEY.md.

Built from scratch on public PySpark APIs only. Not a port: the
reference runs single-threaded OGR cursor loops; this engine declares
logical plans with the DataFrame API and keeps hot paths either in
Catalyst built-ins or Arrow-vectorized pandas UDFs (no per-row Python).
"""

__version__ = "0.1.0"

from gdal_vfr_spark.session import get_spark  # noqa: F401
