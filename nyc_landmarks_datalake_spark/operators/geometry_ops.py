"""Geometry operators under the oracle gate: the reference's WKT
massage modes (R10–R12, CSVIngest.java:60-86) plus the parse-based
upgrade, exercised end-to-end on WKT constructed deterministically from
the nation table (the testdata carries no geometry column; building the
polygon in-query gives both engines the same input by construction).

The Spark side runs the REAL machinery — functions/geometry.py
wkt_parse / wkt_colon_encode / wkt_blank — while the oracle derives the
expected values arithmetically from the same point lists, so a parse
bug cannot cancel out on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.geometry import (
    wkt_blank,
    wkt_colon_encode,
    wkt_parse,
)
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table


@query(
    "q_wkt_geometry",
    sql="""
    WITH pts AS (
        SELECT n_regionkey, list_sort(list(n_nationkey)) AS ns
        FROM nation GROUP BY 1
    ),
    built AS (
        SELECT n_regionkey, ns,
               array_to_string(
                   list_transform(ns, n -> CAST(n * 7 % 100 AS VARCHAR)
                                            || ' ' ||
                                            CAST(n * 3 % 50 AS VARCHAR)),
                   ', ') AS body
        FROM pts
    )
    SELECT n_regionkey,
           'MULTIPOLYGON (((' || body || ')))' AS wkt,
           CAST(len(ns) AS BIGINT) AS n_points,
           CAST(list_min(list_transform(ns, n -> n * 7 % 100)) AS DOUBLE) AS min_lon,
           CAST(list_max(list_transform(ns, n -> n * 7 % 100)) AS DOUBLE) AS max_lon,
           CAST(list_min(list_transform(ns, n -> n * 3 % 50)) AS DOUBLE) AS min_lat,
           CAST(list_max(list_transform(ns, n -> n * 3 % 50)) AS DOUBLE) AS max_lat,
           replace(replace(body, ', ', '::'), ' ', ':') AS encoded,
           '' AS blanked
    FROM built
    """,
)
def q_wkt_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    pts = nation.groupBy("n_regionkey").agg(
        F.array_sort(F.collect_list("n_nationkey")).alias("ns")
    )
    body = F.concat_ws(
        ", ",
        F.transform(
            F.col("ns"),
            lambda n: F.concat_ws(
                " ",
                (n * 7 % 100).cast("string"),
                (n * 3 % 50).cast("string"),
            ),
        ),
    )
    built = pts.select(
        "n_regionkey",
        F.concat(F.lit("MULTIPOLYGON ((("), body, F.lit(")))")).alias("wkt"),
    )
    parsed = wkt_parse(F.col("wkt"))
    ring = parsed[0][0]  # single polygon, single ring by construction
    lons = F.transform(ring, lambda p: p.getField("lon"))
    lats = F.transform(ring, lambda p: p.getField("lat"))
    return built.select(
        "n_regionkey",
        "wkt",
        F.size(ring).cast("long").alias("n_points"),
        F.array_min(lons).alias("min_lon"),
        F.array_max(lons).alias("max_lon"),
        F.array_min(lats).alias("min_lat"),
        F.array_max(lats).alias("max_lat"),
        wkt_colon_encode(F.col("wkt")).alias("encoded"),
        wkt_blank(F.col("wkt")).alias("blanked"),
    )
