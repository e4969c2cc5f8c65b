"""Pure NumPy kernels — no Spark imports here.

These are the algorithmic anchors that must bit-match the reference
(`/root/reference/lib/rings2geojson.ts`, `lib/rewind.ts`,
`lib/geometry.ts`). They are called from vectorized pandas UDFs in
``esri_dump_spark.operators`` — never row-at-a-time from Python loops
over DataFrame rows.
"""
