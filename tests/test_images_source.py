from esri_dump_spark.sources.fixtures import ensure_images_parquet
from esri_dump_spark.sources.images import read_images, IMAGE_COLUMNS


def test_read_images_parquet_fallback(spark):
    path = ensure_images_parquet(50)
    df = read_images(spark, path)
    assert set(IMAGE_COLUMNS) <= set(df.columns)
    assert df.count() == 50


def test_read_images_bytes_pruned(spark):
    path = ensure_images_parquet(50)
    df = read_images(spark, path, with_bytes=False)
    assert "bytes" not in df.columns
    # the scan itself must not read the binary column
    qe = df._jdf.queryExecution().toString()
    read = qe.split("ReadSchema:")[-1].splitlines()[0]
    assert "bytes" not in read


def test_read_images_catalog_table(spark):
    path = ensure_images_parquet(50)
    spark.read.parquet(path).createOrReplaceTempView("images_view")
    df = read_images(spark, "images_view")
    assert df.count() == 50
