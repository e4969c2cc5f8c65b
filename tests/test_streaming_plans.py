"""Streaming operators + plan-compiler (tilejson/renderer) tests."""

from __future__ import annotations

import pandas as pd
import pytest

import pyspark.sql.functions as F

from esri_dump_spark.streaming.events import (
    read_events_stream, windowed_counts, run_available_now, sessionize_batch)
from esri_dump_spark.plans.tilejson import (
    tilejson, bounds_from_extent, strip_vertical_reference)
from esri_dump_spark.plans.renderer import (
    match_expr, step_expr, parse_value, rgba, layer_opacity, pt_to_px,
    scale_to_zoom, compile_renderer)


def test_streaming_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    path = f"{sf_dir}/events.parquet"
    batch = spark.read.parquet(path)
    exp = {(r.window_start, r.event_type): (r.n, r.sum_value)
           for r in windowed_counts(batch).collect()}

    # the file stream source requires a directory
    import shutil
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(path, stream_dir / "part-0.parquet")
    stream = read_events_stream(spark, str(stream_dir))
    assert stream.isStreaming
    q = run_available_now(windowed_counts(stream), "win_counts")
    got = {(r.window_start, r.event_type): (r.n, r.sum_value)
           for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert got == exp


def test_run_available_now_non_aggregated_stream(spark, sf_dir, tmp_path):
    """A non-aggregated stream (raw read) must drain in append mode —
    'complete' is illegal without a streaming aggregation."""
    import shutil
    stream_dir = tmp_path / "events_raw"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-0.parquet")
    stream = read_events_stream(spark, str(stream_dir))
    run_available_now(stream.filter(F.col("value") >= 0), "raw_drain")
    n = spark.sql("SELECT count(*) AS n FROM raw_drain").collect()[0].n
    exp = (spark.read.parquet(f"{sf_dir}/events.parquet")
           .filter(F.col("value") >= 0).count())
    assert n == exp


def test_sessionize_batch(spark):
    pdf = pd.DataFrame({
        "user_id": [1] * 5 + [2] * 2,
        "event_id": range(7),
        "ts": pd.to_datetime([
            "2024-01-01 10:00", "2024-01-01 10:05", "2024-01-01 10:20",
            "2024-01-01 12:00", "2024-01-01 12:10",   # gap -> new session
            "2024-01-01 09:00", "2024-01-01 09:50",   # user 2: gap 50m
        ]),
        "value": [1.0] * 7,
        "event_type": ["click"] * 7,
        "props": [""] * 7,
    })
    out = sessionize_batch(spark.createDataFrame(pdf), gap_minutes=30)
    rows = sorted(out.collect(), key=lambda r: (r.user_id, r.session_start))
    assert [(r.user_id, r.n_events) for r in rows] == [
        (1, 3), (1, 2), (2, 1), (2, 1)]


# ------------------------------------------------------------- tilejson

def test_tilejson_4326_extent_passthrough():
    meta = {"name": "layer", "geometryType": "esriGeometryPoint",
            "extent": {"xmin": -10, "ymin": -5, "xmax": 10, "ymax": 5,
                       "spatialReference": {"wkid": 4326}},
            "fields": [{"name": "objectid", "type": "esriFieldTypeOID"},
                       {"name": "shape", "type": "esriFieldTypeGeometry"}]}
    doc = tilejson(meta, "FeatureServer")
    assert doc["type"] == "vector"
    assert doc["bounds"] == [-10, -5, 10, 5]
    assert doc["center"] == [0, 2.5 - 2.5]
    assert doc["minzoom"] == 0 and doc["maxzoom"] == 22
    # geometry fields dropped from vector_layers
    assert doc["vector_layers"] == [
        {"id": "out", "fields": {"objectid": "number"}}]


def test_tilejson_mercator_reprojection():
    # 102100 -> 3857 web mercator; reference test checks 1e-6 tolerance
    meta = {"geometryType": "esriGeometryPolygon",
            "extent": {"xmin": -13247019.40, "ymin": 4033361.74,
                       "xmax": -13099616.16, "ymax": 4099536.67,
                       "spatialReference": {"wkid": 102100,
                                            "latestWkid": 3857}}}
    doc = tilejson(meta)
    b = doc["bounds"]
    assert b[0] == pytest.approx(-119.0, abs=1e-6)
    assert b[1] == pytest.approx(34.0339511, abs=1e-6)
    assert b[2] == pytest.approx(-117.6758541, abs=1e-6)
    assert b[3] == pytest.approx(34.5251497, abs=1e-6)


def test_tilejson_raster_and_zoom_rules():
    meta = {"serviceDataType": "esriImageServiceDataTypeRGB",
            "minLOD": 3, "maxLOD": 15,
            "extent": {"xmin": 0, "ymin": 0, "xmax": 1, "ymax": 1,
                       "spatialReference": {"wkid": 4326}}}
    doc = tilejson(meta, "ImageServer")
    assert doc["type"] == "raster"
    assert (doc["minzoom"], doc["maxzoom"]) == (3, 15)
    assert "vector_layers" not in doc
    # tileInfo.lods wins over LODs
    meta["tileInfo"] = {"lods": [{"level": 2}, {"level": 9}]}
    doc2 = tilejson(meta, "ImageServer")
    assert (doc2["minzoom"], doc2["maxzoom"]) == (2, 9)


def test_strip_vertical_reference():
    wkt = 'PROJCS["x",GEOGCS["y"]],VERTCS["z",DATUM["w"]]'
    # VERTCS removed, outer content intact
    assert strip_vertical_reference(wkt) == 'PROJCS["x",GEOGCS["y"]]'
    assert strip_vertical_reference('PROJCS["x"]') == 'PROJCS["x"]'


# ------------------------------------------------------------- renderer

def test_scalar_helpers():
    assert rgba([255, 0, 0, 255]) == "rgba(255,0,0,1)"
    assert rgba([0, 0, 0, 128]) == "rgba(0,0,0,0.502)"
    assert rgba(None) == "rgba(0,0,0,1)"
    assert layer_opacity(None) == 1
    assert layer_opacity(25) == 0.75
    assert pt_to_px(12) == 16.0
    assert scale_to_zoom(559082264) == 0.0
    assert scale_to_zoom(545978.77) == pytest.approx(10.0, abs=0.01)
    assert parse_value("42") == 42
    assert parse_value("4.5") == 4.5
    assert parse_value("042") == "042"   # round-trip check fails -> string
    assert parse_value("abc") == "abc"


def test_match_expr_constant_collapse(spark):
    df = spark.range(5).withColumn("b", F.col("id").cast("string"))
    # all branches equal fallback -> constant (reference matchExpr parity)
    col = match_expr(F.col("b"), [("1", "x"), ("2", "x")], "x")
    vals = {r[0] for r in df.select(col).collect()}
    assert vals == {"x"}
    col2 = match_expr(F.col("b"), [("1", "one"), ("2", "two")], "other")
    got = [r[0] for r in df.select(col2).orderBy("id").collect()]
    assert got == ["other", "one", "two", "other", "other"]


def test_step_expr_and_compile_renderer(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": [1.0, 10.0, 25.0, 99.0]}))
    col = step_expr(F.col("v"), [(10.0, "mid"), (25.0, "high")], "low")
    got = [r[0] for r in df.select(col).collect()]
    assert got == ["low", "mid", "high", "high"]

    uv = {"type": "uniqueValue", "field1": "name",
          "uniqueValueInfos": [{"value": "a", "label": "A"},
                               {"value": "b", "label": "B"}]}
    df2 = spark.createDataFrame(pd.DataFrame({"name": ["a", "b", "c"]}))
    got2 = [r[0] for r in df2.select(compile_renderer(uv)).collect()]
    assert got2 == ["A", "B", "other"]


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark over a replayed (duplicated)
    stream must equal the batch dropDuplicates result; state is
    watermark-bounded instead of stream-length-bounded."""
    import pyspark.sql.functions as F
    from esri_dump_spark.streaming.events import dedup_events

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("user_id") < 50)
          .select("event_id", "ts", "user_id", "value"))

    # two overlapping files: the second re-delivers half of the first
    # (a retried page / at-least-once source)
    rows = ev.orderBy("ts").collect()
    half, q3 = len(rows) // 2, (3 * len(rows)) // 4
    inp = str(tmp_path / "dup_stream_in")
    spark.createDataFrame(rows[:q3], ev.schema).coalesce(1) \
        .write.mode("append").parquet(inp)
    spark.createDataFrame(rows[half:], ev.schema).coalesce(1) \
        .write.mode("append").parquet(inp)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(inp))
    q = (dedup_events(stream, keys=["event_id"], watermark="24 hours")
         .writeStream.format("memory").queryName("dedup_stream")
         .option("checkpointLocation", str(tmp_path / "dckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sorted(r.event_id for r in
                 spark.sql("SELECT event_id FROM dedup_stream").collect())
    exp = sorted(r.event_id for r in
                 dedup_events(ev).select("event_id").collect())
    assert got == exp  # every row exactly once despite the replay


def test_sessionize_stream_stateful(spark, sf_dir, tmp_path):
    """applyInPandasWithState gap sessionization: closed sessions
    emitted across micro-batches must equal the batch sessionizer's
    result minus each user's still-open tail session."""
    import pyspark.sql.functions as F
    from esri_dump_spark.streaming.events import (sessionize_batch,
                                                  sessionize_stream)

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("user_id") < 20)
          .select("user_id", "event_id", "ts", "value"))

    # three time-sliced input files -> per-user event-time order holds
    # across micro-batches
    rows = ev.orderBy("ts").collect()
    cuts = [len(rows) // 3, 2 * len(rows) // 3, len(rows)]
    inp = str(tmp_path / "stream_in")
    lo = 0
    for i, hi in enumerate(cuts):
        spark.createDataFrame(rows[lo:hi], ev.schema).coalesce(1) \
            .write.mode("append").parquet(inp)
        lo = hi

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(inp))
    q = (sessionize_stream(stream, gap_minutes=30)
         .writeStream.format("memory").queryName("sess_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sorted(tuple(r) for r in spark.sql(
        "SELECT user_id, session_start, session_end, n_events, "
        "round(sum_value, 6) AS sv FROM sess_stream").collect())

    batch = sessionize_batch(ev, gap_minutes=30)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.col("session_start").desc())
    closed = (batch.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") > 1)   # drop each user's open tail
              .select("user_id", "session_start", "session_end", "n_events",
                      F.round("sum_value", 6).alias("sv")))
    exp = sorted(tuple(r) for r in closed.collect())
    assert len(got) > 0
    assert got == exp


def test_streaming_state_stays_bounded(spark, sf_dir, tmp_path):
    """Output parity is not enough for a 100 TB stream — the state
    store must be horizon-bounded, not stream-length-bounded. Replay
    30 days of events as 6 time-sliced micro-batches and assert from
    recentProgress.stateOperators that (a) the sessionizer's state
    never exceeds one open session per user, flat across batches, and
    (b) the watermark dedup's state is evicted down to the trailing
    horizon instead of accumulating every key ever seen."""
    import json
    import pyspark.sql.functions as F
    from esri_dump_spark.streaming.events import (dedup_events,
                                                  sessionize_stream)

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("user_id") < 50)
          .select("user_id", "event_id", "ts", "value"))
    rows = ev.orderBy("ts").collect()
    n_users = len({r.user_id for r in rows})
    n_slices = 6
    inp = str(tmp_path / "state_stream_in")
    step = (len(rows) + n_slices - 1) // n_slices
    for i in range(n_slices):
        spark.createDataFrame(rows[i * step:(i + 1) * step], ev.schema) \
            .coalesce(1).write.mode("append").parquet(inp)

    def state_per_batch(make_query):
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", 1).parquet(inp))
        q = make_query(stream)
        q.awaitTermination(180)
        per_batch = []
        for p in q.recentProgress:
            if isinstance(p, str):
                p = json.loads(p)
            ops = p.get("stateOperators") or []
            if ops:
                per_batch.append(int(ops[0]["numRowsTotal"]))
        return per_batch

    sess_state = state_per_batch(lambda s: (
        sessionize_stream(s, gap_minutes=30)
        .writeStream.format("memory").queryName("sess_state_probe")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .outputMode("append").trigger(availableNow=True).start()))
    assert len(sess_state) >= n_slices
    # one open session per user, every batch — flat, never ~stream size
    assert max(sess_state) <= n_users, sess_state
    assert sess_state[-1] <= n_users

    dedup_state = state_per_batch(lambda s: (
        dedup_events(s, keys=["event_id"], watermark="24 hours")
        .writeStream.format("memory").queryName("dedup_state_probe")
        .option("checkpointLocation", str(tmp_path / "dckpt2"))
        .outputMode("append").trigger(availableNow=True).start()))
    assert len(dedup_state) >= n_slices
    # ~41 of the 1000 rows fall in any trailing 24h window; a slice is
    # ~5 days, so post-eviction state is at most one slice + horizon —
    # far below the full stream, which is what unbounded state would hold
    assert dedup_state[-1] <= len(rows) // 2, dedup_state
    assert max(dedup_state) < len(rows), dedup_state


def test_streaming_pip_counts_match_batch(spark, sf_dir, tmp_path):
    """The PIP join is stateless, so streaming it micro-batch by
    micro-batch plus a windowed rollup must equal the batch twin."""
    import json
    import pandas as pd
    import pyspark.sql.functions as F
    from esri_dump_spark.streaming.spatial import streaming_pip_counts

    polys = pd.DataFrame({
        "poly_id": [0, 1],
        "rings_json": [
            json.dumps([[[-95.0, 22.0], [-95.0, 27.0], [-91.0, 27.0],
                         [-91.0, 22.0], [-95.0, 22.0]]]),
            json.dumps([[[-97.0, 20.6], [-97.0, 24.0], [-94.0, 24.0],
                         [-94.0, 20.6], [-97.0, 20.6]]]),
        ]})

    from esri_dump_spark.functions.geo_sql import derived_lonlat_sql
    lon, lat = derived_lonlat_sql("event_id", 4000, 3000, -96.0, 21.0)
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts",
                      f"{lon} AS lon", f"{lat} AS lat"))

    inp = str(tmp_path / "pts_in")
    rows = ev.orderBy("event_id").collect()
    for i in range(2):
        spark.createDataFrame(rows[i * len(rows) // 2:
                                   (i + 1) * len(rows) // 2], ev.schema) \
            .coalesce(1).write.mode("append").parquet(inp)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(inp))
    q = (streaming_pip_counts(stream, polys, res=8, window="1 day")
         .writeStream.format("memory").queryName("pip_stream")
         .option("checkpointLocation", str(tmp_path / "pip_ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    # append mode only emits windows the watermark has closed; compare
    # those against the batch twin restricted to the same windows
    got = {(r.window_start, r.poly_id): r.n
           for r in spark.sql("SELECT * FROM pip_stream").collect()}
    assert got, "no windows closed — watermark never advanced"
    batch = streaming_pip_counts(ev, polys, res=8, window="1 day")
    exp = {(r.window_start, r.poly_id): r.n for r in batch.collect()}
    for k, v in got.items():
        assert exp.get(k) == v, (k, v, exp.get(k))


def test_class_breaks_open_below_first_class(spark):
    """stylejson.ts:970: `renderer.minValue ?? -Infinity` — a first
    class with neither classMinValue nor renderer minValue is open
    below, not a TypeError."""
    rend = {"type": "classBreaks", "field": "v",
            "classBreakInfos": [{"classMaxValue": 10, "label": "low"},
                                {"classMaxValue": 99, "label": "high"}]}
    df = spark.createDataFrame(pd.DataFrame({"v": [-1e9, 5.0, 50.0]}))
    got = [r.cls for r in df.withColumn(
        "cls", compile_renderer(rend)).orderBy("v").collect()]
    assert got == ["low", "low", "high"]


def test_streaming_sketch_fold_matches_batch(spark, sf_dir, tmp_path):
    """The mergeable-sketch streaming story, proven end-to-end: three
    micro-batches (maxFilesPerTrigger=1) each build an HLL register
    sketch and a histogram sketch via foreachBatch; folding the
    per-batch sketch state (max / sum — `hll_merge`/`hist_merge`)
    reproduces the whole-table sketches EXACTLY, registers, buckets
    and the bit-exact estimator included. This is the 100 TB shape:
    per-shard/day sketch state accumulates without re-reading raw
    data, and a streaming job checkpoints sketch rows, never values."""
    import duckdb

    from esri_dump_spark.operators.hist import hist_merge, hist_sketch
    from esri_dump_spark.operators.sketch import (hll_estimate,
                                                  hll_merge,
                                                  hll_register_table)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sdir = tmp_path / "ev_shards"
    sdir.mkdir()
    # duckdb writes micro-precision timestamps Spark's fixed stream
    # schema accepts (a pandas/pyarrow roundtrip would emit nanos)
    con = duckdb.connect()
    for i in range(3):
        con.execute(
            f"COPY (SELECT * FROM '{sf_dir}/events.parquet' "
            f"WHERE event_id % 3 = {i}) TO "
            f"'{sdir}/s{i}.parquet' (FORMAT parquet)")

    reg_parts, hist_parts = [], []

    def fold(batch_df, batch_id):
        reg_parts.append(
            hll_register_table(batch_df, "user_id", ("event_type",),
                               m=256).collect())
        hist_parts.append(
            hist_sketch(batch_df, "value", 0.0, 1000.0, 64,
                        ("event_type",)).collect())

    stream = read_events_stream(spark, str(sdir))
    q = (stream.writeStream.foreachBatch(fold)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    assert len(reg_parts) == 3 and len(hist_parts) == 3  # one per file

    def df_of(rows_lists, schema_src):
        return [spark.createDataFrame(rows, schema_src.schema)
                for rows in rows_lists]

    whole_regs = hll_register_table(ev, "user_id", ("event_type",),
                                    m=256)
    folded_regs = hll_merge(*df_of(reg_parts, whole_regs))
    as_map = lambda d, v: {tuple(r[:-1]): r[-1] for r in d.collect()}
    assert as_map(folded_regs, "m_j") == as_map(whole_regs, "m_j")
    # the estimator over folded state is bit-identical too
    import struct
    est_w = {r["event_type"]: r for r in
             hll_estimate(whole_regs, ("event_type",), 256).collect()}
    est_f = {r["event_type"]: r for r in
             hll_estimate(folded_regs, ("event_type",), 256).collect()}
    assert set(est_w) == set(est_f)
    for k in est_w:
        assert est_w[k]["z_int"] == est_f[k]["z_int"]
        assert (struct.pack("<d", est_w[k]["est_raw"]) ==
                struct.pack("<d", est_f[k]["est_raw"]))

    whole_hist = hist_sketch(ev, "value", 0.0, 1000.0, 64,
                             ("event_type",))
    folded_hist = hist_merge(*df_of(hist_parts, whole_hist))
    assert as_map(folded_hist, "cnt") == as_map(whole_hist, "cnt")
