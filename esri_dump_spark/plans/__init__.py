"""Driver-side derived-metadata compilers (schema / tilejson / renderer).

These operate on single layer-metadata documents — tiny inputs — so
they stay plain Python on the driver; only their *outputs* (StructType,
CASE WHEN columns) flow into distributed plans.
"""
