"""Source/sink format coverage: every built-in columnar/text format the
engine claims (parquet is exercised everywhere else) round-trips with
schema and values intact. The reference's only format is raw CSV lines
over S3 (CSVIngest.java:102-117, :265-269); the engine exposes the full
DataFrameReader/Writer matrix."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.sources.catalog import table


def _orders_sample(spark, sf_small):
    return table(spark, sf_small, "orders").limit(500)


def _assert_same(a, b, key="o_orderkey"):
    assert a.count() == b.count()
    assert a.schema == b.schema, (a.schema, b.schema)
    av = a.agg(F.sum(key), F.sum(F.hash("o_orderstatus"))).collect()[0]
    bv = b.agg(F.sum(key), F.sum(F.hash("o_orderstatus"))).collect()[0]
    assert tuple(av) == tuple(bv)


def test_csv_roundtrip(spark, sf_small, tmp_path):
    df = _orders_sample(spark, sf_small)
    path = str(tmp_path / "orders_csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.option("header", True).schema(df.schema).csv(path)
    )
    _assert_same(df, back)


def test_json_roundtrip(spark, sf_small, tmp_path):
    df = _orders_sample(spark, sf_small)
    path = str(tmp_path / "orders_json")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(df.schema).json(path)
    _assert_same(df, back)


def test_orc_roundtrip(spark, sf_small, tmp_path):
    df = _orders_sample(spark, sf_small)
    path = str(tmp_path / "orders_orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    _assert_same(df, back)


def test_text_sink_single_object(spark, sf_small, tmp_path):
    # the reference's sink shape: one joined text object (R14,
    # CSVIngest.java:265-269) — coalesce(1) for single-file parity.
    df = _orders_sample(spark, sf_small).select(
        F.concat_ws(
            ",", F.col("o_orderkey").cast("string"), F.col("o_orderstatus")
        ).alias("value")
    )
    path = str(tmp_path / "orders_txt")
    df.coalesce(1).write.mode("overwrite").text(path)
    import glob

    files = glob.glob(path + "/part-*")
    assert len(files) == 1
    back = spark.read.text(path)
    assert back.count() == df.count()


def test_python_datasource_write_path(spark, sf_small, tmp_path):
    """Spark 4 Python DataSource WRITE contract: task part files +
    driver commit manifest, then a read-back equality check."""
    import json
    import os

    from nyc_landmarks_datalake_spark.sources.catalog import table
    from nyc_landmarks_datalake_spark.sources.pyds import register_lcg_source

    register_lcg_source(spark)
    rows = (
        table(spark, sf_small, "orders")
        .selectExpr(
            "CAST(o_orderkey % 7 AS INT) AS part_id",
            "CAST(o_orderkey AS INT) AS row_idx",
            "CAST(o_custkey AS BIGINT) AS value",
        )
        .limit(500)
    )
    out = str(tmp_path / "pyds_out")
    rows.repartition(3).write.format("lcgsource").option("path", out).mode(
        "append"
    ).save()

    with open(os.path.join(out, "_SUCCESS")) as f:
        manifest = json.load(f)
    assert manifest["rows"] == 500
    assert len(manifest["parts"]) == 3
    for p in manifest["parts"]:
        assert os.path.exists(os.path.join(out, p))

    back = spark.read.json(out, schema="part_id INT, row_idx INT, value BIGINT")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, rows.collect())
    )
