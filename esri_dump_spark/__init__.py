"""esri_dump_spark — a PySpark-native spatial-join + tiling engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of ``openaddresses/esri-dump``: paged ESRI FeatureServer
geometry extraction replayed as a partition-parallel DataFrame
pipeline, extended with an H3-style cell-indexed join layer (point-in-
polygon spatial join, cell-bucketed kNN, raster-tile<->vector
assignment) over image+caption tables, plus the training-data-pipeline
operators (dedup families, ANN, text quality, multimodal plumbing).

Layout:
  kernels/    pure NumPy geometry + cell-index + image kernels (no Spark)
  sources/    deterministic synthetic sources (FeatureServer replay, fixtures)
  operators/  DataFrame operators (extract, spatial join, kNN, tiles, dedup, ...)
  functions/  column-level helpers (JVM-side expressions)
  plans/      derived-metadata compilers (schema / tilejson / stylejson)
  streaming/  Structured Streaming variants of the extraction pipeline
"""

__version__ = "0.1.0"
