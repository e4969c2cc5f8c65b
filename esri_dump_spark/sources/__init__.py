"""Deterministic synthetic sources.

No network in this environment: the reference's live ArcGIS endpoints
are replaced by an in-process, seed-deterministic FeatureServer replay
(paging, exceededTransferLimit, boundary-overlap duplicates) and
parquet fixture generators for the image/polygon tables.
"""
