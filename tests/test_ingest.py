"""Golden ingest tests (SURVEY §5.2.1): sidecar parsing, header
validation, geometry modes, partitioned writes, and the byte-compat
massage path — run against a synthetic landmarks-style fixture, plus the
reference's own fixture when available (golden counts: 144 records,
28 columns, ragged-row quote survival)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.geometry import (
    wkt_blank,
    wkt_colon_encode,
    wkt_parse,
    wkt_unparse,
)
from nyc_landmarks_datalake_spark.ingest.csv_ingest import (
    ingest_compat,
    ingest_csv,
    massage_lines,
)
from nyc_landmarks_datalake_spark.schema.sidecar import (
    SchemaValidationError,
    parse_sidecar,
    partition_keys,
    validate_header,
)

REF_CSV = "/root/reference/src/test/resources/testData.csv"
REF_SCHEMA = "/root/reference/src/test/resources/testSchema.json"

SIDECAR = [
    {"key": "OBJECTID", "type": "bigint", "partition_key": "false", "comment": "id"},
    {"key": "the_geom", "type": "string", "partition_key": "false", "comment": "wkt"},
    {"key": "AREA_NAME", "type": "string", "partition_key": "false", "comment": ""},
    {"key": "BOROUGH", "type": "string", "partition_key": "true", "comment": "zone"},
    {"key": "Shape_area", "type": "double", "partition_key": "false", "comment": ""},
]

ROWS = [
    '1,"MULTIPOLYGON (((-73.78 40.79, -73.79 40.80, -73.78 40.79)))","Fort Totten",QN,12.5',
    '2,"MULTIPOLYGON (((-73.10 40.10, -73.20 40.20, -73.10 40.10)), '
    '((-74.00 41.00, -74.10 41.10, -74.00 41.00)))","Two Polys, Inc.",BK,7.25',
    '3,"MULTIPOLYGON (((-73.50 40.50, -73.60 40.60, -73.50 40.50), '
    '(-73.51 40.51, -73.52 40.52, -73.51 40.51)))","Ring, with hole",MN,3.75',
]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("landmarks")
    csv = d / "landmarks.csv"
    csv.write_text(
        "OBJECTID,the_geom,AREA_NAME,BOROUGH,Shape_area\n" + "\n".join(ROWS) + "\n"
    )
    schemas = d / "schemas"
    schemas.mkdir()
    (schemas / "landmarks.json").write_text(json.dumps({"schema": SIDECAR}))
    return d


def test_sidecar_grammars():
    bare = json.dumps(SIDECAR)
    wrapped = json.dumps({"schema": SIDECAR})
    malformed = f'"schema": {json.dumps(SIDECAR)}'  # the reference fixture shape
    for text in (bare, wrapped, malformed):
        s = parse_sidecar(text)
        assert [f.name for f in s.fields] == [
            "OBJECTID", "the_geom", "AREA_NAME", "BOROUGH", "Shape_area",
        ]
        assert partition_keys(s) == ["BOROUGH"]
    assert parse_sidecar(bare)["OBJECTID"].dataType.typeName() == "long"
    assert parse_sidecar(bare)["Shape_area"].dataType.typeName() == "double"


def test_validate_header_modes():
    s = parse_sidecar(json.dumps(SIDECAR))
    good = [f.name for f in s.fields]
    assert validate_header(good, s) == []
    bad = list(good)
    bad[1] = "geometry"
    assert validate_header(bad, s) != []
    with pytest.raises(SchemaValidationError):
        validate_header(bad, s, strict=True)
    assert validate_header(good[:-1], s)  # arity mismatch reported


def test_ingest_quoted_commas_survive(spark, fixture_dir, tmp_path):
    out = tmp_path / "silver"
    ingest_csv(
        spark,
        str(fixture_dir / "landmarks.csv"),
        str(fixture_dir / "schemas" / "landmarks.json"),
        str(out),
        geometry_mode="encode",
    )
    back = spark.read.parquet(str(out))
    rows = {r["OBJECTID"]: r for r in back.collect()}
    assert len(rows) == 3
    # quoted commas survive (the reference's quote-strip corrupts these,
    # SURVEY §1.4.2)
    assert rows[2]["AREA_NAME"] == "Two Polys, Inc."
    assert rows[3]["AREA_NAME"] == "Ring, with hole"
    # partitioned layout by BOROUGH
    assert (out / "BOROUGH=QN").exists()
    # intended colon encoding
    assert rows[1]["the_geom"] == "-73.78:40.79::-73.79:40.80::-73.78:40.79"


def test_geometry_modes(spark):
    wkt = "MULTIPOLYGON (((-73.78 40.79, -73.79 40.8, -73.78 40.79)))"
    df = spark.createDataFrame([(wkt,)], ["g"])
    got = df.select(
        wkt_blank(F.col("g")).alias("blank"),
        wkt_colon_encode(F.col("g")).alias("enc"),
        wkt_parse(F.col("g")).alias("parsed"),
        wkt_unparse(wkt_parse(F.col("g"))).alias("roundtrip"),
    ).collect()[0]
    assert got["blank"] == ""
    assert got["enc"] == "-73.78:40.79::-73.79:40.8::-73.78:40.79"
    assert got["parsed"][0][0][0]["lon"] == -73.78
    assert got["parsed"][0][0][0]["lat"] == 40.79
    assert got["roundtrip"] == wkt


def test_massage_compat(spark, tmp_path):
    lines = spark.createDataFrame(
        [
            ('1,"MULTIPOLYGON (((-73.7 40.7, -73.8 40.8)))","A, B",QN',),
            ("plain,line,no,geometry",),
        ],
        ["value"],
    )
    got = [r["value"] for r in massage_lines(lines).collect()]
    # de facto reference behavior: quotes stripped, geometry blanked —
    # note the ragged-row corruption is faithfully preserved here
    assert got[0] == "1,,A, B,QN"
    assert got[1] == "plain,line,no,geometry"


@pytest.mark.skipif(not os.path.exists(REF_CSV), reason="reference fixture absent")
def test_reference_fixture_golden(spark, tmp_path):
    out = tmp_path / "ref_silver"
    df = ingest_csv(
        spark,
        REF_CSV,
        REF_SCHEMA,
        str(out),
        geometry_mode="encode",
        strict=False,
    )
    assert len(df.columns) == 28
    assert df.count() == 144
    back = spark.read.parquet(str(out))
    assert back.count() == 144
    # every encoded geometry is colon-separated coords: no spaces, commas,
    # parens, or WKT tokens remain
    bad = back.filter(
        F.col("the_geom").contains(" ")
        | F.col("the_geom").contains(",")
        | F.col("the_geom").contains("(")
        | F.col("the_geom").contains("MULTIPOLYGON")
    ).count()
    assert bad == 0
    encoded = back.filter(F.col("the_geom").contains("::")).count()
    assert encoded == 144
    # quoted fields with embedded commas parse into their own column (the
    # reference's quote-strip-then-split explodes such rows to 28-38
    # fields, SURVEY §1.4.2)
    with_commas = back.filter(F.col("OTHER_NOTE").contains(",")).count()
    assert with_commas > 0


@pytest.mark.skipif(not os.path.exists(REF_CSV), reason="reference fixture absent")
def test_reference_compat_massage_golden(spark, tmp_path):
    out = tmp_path / "compat"
    massaged = ingest_compat(spark, REF_CSV, str(out))
    vals = [r["value"] for r in massaged.collect()]
    assert len(vals) == 145  # header + 144
    assert not any("MULTIPOLYGON" in v for v in vals)
    assert not any('"' in v for v in vals)
