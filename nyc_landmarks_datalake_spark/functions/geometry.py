"""WKT MULTIPOLYGON column expressions — the reference's one domain
transform, re-expressed as built-in Column chains (JVM codegen, no UDF).

The reference massages raw CSV *lines* (CSVIngest.java:60-86); we
operate on a parsed geometry *column*, which fixes its quote-stripping
corruption of ragged rows (SURVEY §1.4.2). Three modes:

- ``blank``  — the reference's DE FACTO behavior: :67 strips the literal
  token, :68 deletes the whole (((...))) block, so downstream consumers
  saw an empty geometry field.
- ``encode`` — the reference's INTENDED behavior (dead code at :71-81,
  unreachable because :68 already deleted the block): coordinates
  rewritten `lon:lat::lon:lat::…` with `:::` separating rings.
- ``parse``  — the Spark-native upgrade: full nested structure
  array<array<array<struct<lon,lat>>>> (multipolygon → polygon → ring →
  point), ready for real geo work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The coordinate block: (((...))) with digits/sign/dot/comma/space/parens
# (character class from CSVIngest.java:68).
_BLOCK = r"\(\(\([0-9\-\., ()]+\)\)\)"


def wkt_blank(col: Column) -> Column:
    """De facto reference semantics: blank the geometry (R10+R11)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(col, "MULTIPOLYGON ", ""), _BLOCK, "")
    )


def wkt_colon_encode(col: Column) -> Column:
    """Intended reference semantics (dead code, CSVIngest.java:71-81):
    colon-encode the coordinate block. The dead branch only handled a
    single ring (`, ` → `::`, ` ` → `:`); we normalize the full grammar:
    polygon sep `)), ((` → `::::`, ring sep `), (` → `:::`, point sep
    `, ` → `::`, lon/lat sep ` ` → `:` — unambiguous and reversible."""
    inner = F.regexp_extract(col, r"\(\(\((.*)\)\)\)", 1)
    step0 = F.regexp_replace(inner, r"\)\), \(\(", "::::")
    step1 = F.regexp_replace(step0, r"\), \(", ":::")
    step2 = F.regexp_replace(step1, ", ", "::")
    return F.regexp_replace(step2, " ", ":")


def wkt_parse(col: Column) -> Column:
    """MULTIPOLYGON (((x y, x y, ...)), ((...))) → nested arrays of
    struct<lon:double, lat:double>. Pure split/transform composition."""
    inner = F.regexp_extract(col, r"MULTIPOLYGON \(\((.*)\)\)", 1)
    # polygons separated by ")), ((", rings within a polygon by "), ("
    polygons = F.split(inner, r"\)\), \(\(")
    return F.transform(
        polygons,
        lambda poly: F.transform(
            F.split(F.regexp_replace(poly, r"^\(|\)$", ""), r"\), \("),
            lambda ring: F.transform(
                F.split(ring, ", "),
                lambda pt: F.struct(
                    F.split(pt, " ").getItem(0).cast("double").alias("lon"),
                    F.split(pt, " ").getItem(1).cast("double").alias("lat"),
                ),
            ),
        ),
    )


def wkt_unparse(col: Column) -> Column:
    """Inverse of wkt_parse (roundtrip testing): nested arrays → WKT."""
    ring_txt = lambda ring: F.concat_ws(  # noqa: E731
        ", ",
        F.transform(
            ring,
            lambda pt: F.concat_ws(
                " ",
                pt.getField("lon").cast("string"),
                pt.getField("lat").cast("string"),
            ),
        ),
    )
    poly_txt = lambda poly: F.concat(  # noqa: E731
        F.lit("("),
        F.concat_ws(
            "), (", F.transform(poly, lambda ring: ring_txt(ring))
        ),
        F.lit(")"),
    )
    return F.concat(
        F.lit("MULTIPOLYGON (("),
        F.concat_ws(")), ((", F.transform(col, lambda poly: poly_txt(poly))),
        F.lit("))"),
    )
