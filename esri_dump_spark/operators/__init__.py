"""DataFrame operators — the engine's distributed surface.

Every operator here is declarative-first: built-in pyspark.sql
functions wherever the semantics allow, Arrow-batched pandas UDFs /
mapInPandas for the geometry and image kernels, never row-at-a-time
Python over rows.
"""
