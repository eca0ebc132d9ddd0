"""Web-corpus curation primitives: URL canonicalization (crawl dedup),
PII detection + redaction, and sequence-length bucketing for training
batch construction.

A web-scale training pipeline spends real money on exactly these three
steps: collapsing crawl-URL aliases before fetching/deduping, scrubbing
emails/phones before training, and length-bucketing documents so a
batch pads to its bucket max instead of the corpus max. The test corpus
has no organic URLs or PII, so each query *constructs* its payloads
in-engine from table columns with Spark built-ins (the decode-tier
pattern, cf. operators/multimodal.py) — the oracle independently
re-parses the same constructed strings, so a green row proves the
parsing/redaction semantics, not the construction.

Scale posture: URL and PII work is pure map-side string/regex inside
whole-stage codegen followed by one hash-agg shuffle. Length bucketing
rides the distributed two-pass global row_number (operators/windows.py)
— a range-partitioned local sort plus a P-row offset join, never a
single-partition window. Regex patterns are written without backslash
escapes (character classes only) so the identical pattern string is
valid Java regex (Spark) and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.functions.hashing import md5_long, md5_long_sql
from nyc_landmarks_datalake_spark.operators.windows import distributed_row_number
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table

#: sum-safe checksum modulus (sums of 5e5 terms stay far below 2^63)
_CKMOD = 1_000_000_007

#: dialect-portable PII patterns — character classes only, no backslash
#: escape sequences, valid verbatim in Java regex AND RE2.
_EMAIL_PAT = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
_PHONE_PAT = "[+]1-555-[0-9]{4}"


# ---------------------------------------------------------------------------
# URL canonicalization: lowercase host, strip default port, drop utm_*
# tracking params, sort surviving params. The census proves aliases
# collapse: distinct canonical < distinct raw.
# ---------------------------------------------------------------------------
_RAW_URL_SQL = """
    'https://Shop-' || CAST(o_custkey % 50 AS VARCHAR) || '.Example.COM'
    || CASE WHEN o_orderkey % 3 = 0 THEN ':443' ELSE '' END
    || '/account/' || CAST(o_custkey % 997 AS VARCHAR)
    || '?' ||
    CASE WHEN o_orderkey % 2 = 0
         THEN 'id=' || CAST(o_custkey % 97 AS VARCHAR) || '&utm_source=aff&ref=Home'
         ELSE 'utm_source=aff&ref=Home&id=' || CAST(o_custkey % 97 AS VARCHAR)
    END
"""


@query(
    "q_url_canonicalize",
    sql=f"""
    WITH raw AS (
        SELECT ({_RAW_URL_SQL}) AS url FROM orders
    ),
    parsed AS (
        SELECT url,
               lower(regexp_extract(url, 'https://([^/:]+)', 1)) AS host,
               regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '[?](.*)', 1) AS query
        FROM raw
    ),
    canon AS (
        SELECT url, host,
               'https://' || host || path || '?' ||
               array_to_string(
                   list_sort(list_filter(string_split(query, '&'),
                                         p -> NOT starts_with(p, 'utm_'))),
                   '&') AS canon_url
        FROM parsed
    )
    SELECT host,
           COUNT(*) AS n_urls,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_distinct,
           CAST(COUNT(DISTINCT canon_url) AS BIGINT) AS n_canon_distinct,
           CAST(SUM({md5_long_sql('canon_url')} % {_CKMOD}) AS BIGINT)
               AS canon_hash_sum
    FROM canon
    GROUP BY host
    """,
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-URL alias collapse via parse_url + higher-order functions.

    The Spark side parses with the native ``parse_url`` expression
    (HOST/PATH/QUERY extraction in the JVM); params are split, filtered
    of ``utm_*`` trackers and sorted with array higher-order functions —
    zero Python, zero extra shuffles. The oracle re-parses the same raw
    strings with RE2 + list lambdas, so host/path/query extraction,
    tracker stripping and param ordering must all agree byte-for-byte
    (the md5 checksum pins the full canonical string).
    """
    orders = table(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://Shop-"),
        (F.col("o_custkey") % 50).cast("string"),
        F.lit(".Example.COM"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/account/"),
        (F.col("o_custkey") % 997).cast("string"),
        F.lit("?"),
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.concat(
                F.lit("id="),
                (F.col("o_custkey") % 97).cast("string"),
                F.lit("&utm_source=aff&ref=Home"),
            ),
        ).otherwise(
            F.concat(
                F.lit("utm_source=aff&ref=Home&id="),
                (F.col("o_custkey") % 97).cast("string"),
            )
        ),
    )
    raw = orders.select(url.alias("url"))
    host = F.lower(F.parse_url(F.col("url"), F.lit("HOST")))
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    qstr = F.parse_url(F.col("url"), F.lit("QUERY"))
    params = F.filter(
        F.split(qstr, "&"), lambda p: ~p.startswith("utm_")
    )
    canon = F.concat(
        F.lit("https://"),
        host,
        path,
        F.lit("?"),
        F.array_join(F.array_sort(params), "&"),
    )
    return (
        raw.select("url", host.alias("host"), canon.alias("canon_url"))
        .groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("url").alias("n_raw_distinct"),
            F.countDistinct("canon_url").alias("n_canon_distinct"),
            F.sum(md5_long(F.col("canon_url")) % _CKMOD).alias("canon_hash_sum"),
        )
    )


# ---------------------------------------------------------------------------
# PII detection + redaction: regex census of emails/phones and a
# checksum of the scrubbed text (proves the replacement, not just the
# count).
# ---------------------------------------------------------------------------
_PII_TEXT_SQL = """
    'Contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
    || '@mail' || CAST(c_nationkey % 5 AS VARCHAR) || '.com or +1-555-'
    || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || '. '
    || lower(c_mktsegment)
"""


@query(
    "q_pii_redaction",
    sql=f"""
    WITH docs AS (
        SELECT c_nationkey, ({_PII_TEXT_SQL}) AS text FROM customer
    ),
    scrubbed AS (
        SELECT c_nationkey,
               len(regexp_extract_all(text, '{_EMAIL_PAT}')) AS n_emails,
               len(regexp_extract_all(text, '{_PHONE_PAT}')) AS n_phones,
               regexp_replace(regexp_replace(text, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                              '{_PHONE_PAT}', '<PHONE>', 'g') AS red
        FROM docs
    )
    SELECT c_nationkey,
           COUNT(*) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS n_emails,
           CAST(SUM(n_phones) AS BIGINT) AS n_phones,
           CAST(SUM(length(red)) AS BIGINT) AS redacted_chars,
           CAST(SUM({md5_long_sql('red')} % {_CKMOD}) AS BIGINT)
               AS redacted_hash_sum
    FROM scrubbed
    GROUP BY c_nationkey
    """,
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone census + redaction over constructed contact records.

    Detection uses ``regexp_extract_all`` counts; redaction replaces
    every occurrence (Spark's regexp_replace is global; the oracle
    passes RE2's 'g' flag). The md5 checksum of the scrubbed text is
    the strong claim: both engines must produce the identical redacted
    byte string for every row.
    """
    cust = table(spark, sf_dir, "customer")
    text = F.concat(
        F.lit("Contact "),
        F.col("c_name"),
        F.lit(" at user"),
        F.col("c_custkey").cast("string"),
        F.lit("@mail"),
        (F.col("c_nationkey") % 5).cast("string"),
        F.lit(".com or +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(". "),
        F.lower(F.col("c_mktsegment")),
    )
    docs = cust.select("c_nationkey", text.alias("text"))
    n_emails = F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_PAT), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_PAT), F.lit(0)))
    red = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_PAT, "<EMAIL>"),
        _PHONE_PAT,
        "<PHONE>",
    )
    return (
        docs.select(
            "c_nationkey",
            n_emails.alias("n_emails"),
            n_phones.alias("n_phones"),
            red.alias("red"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_emails").alias("n_emails"),
            F.sum("n_phones").alias("n_phones"),
            F.sum(F.length("red")).alias("redacted_chars"),
            F.sum(md5_long(F.col("red")) % _CKMOD).alias("redacted_hash_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Length-bucketed batch construction: NTILE(16) over (n_chars, doc_id)
# and the padding waste a bucket-max pad policy pays vs corpus-max.
# ---------------------------------------------------------------------------
_BUCKETS = 16


@query(
    "q_length_bucket_batching",
    sql=f"""
    WITH ranked AS (
        SELECT doc_id, n_chars,
               ntile({_BUCKETS}) OVER (ORDER BY n_chars, doc_id) AS bucket
        FROM documents
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_len,
           MAX(n_chars) AS max_len,
           CAST(SUM(n_chars) AS BIGINT) AS sum_len,
           CAST(COUNT(*) * MAX(n_chars) - SUM(n_chars) AS BIGINT)
               AS padding_waste
    FROM ranked
    GROUP BY bucket
    """,
)
def q_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing for padded-batch efficiency.

    Global NTILE is computed WITHOUT a single-partition sort: the
    distributed two-pass row_number (range partition + P-row offset
    join, operators/windows.py) feeds the SQL-standard bucket-sizing
    arithmetic (first n%B buckets take one extra row) — the exact
    semantics the oracle's native NTILE implements. padding_waste is
    the integer cost of padding every doc in a bucket to the bucket
    max; summed over buckets it is the quantity length-aware batching
    minimizes.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    base = distributed_row_number(docs, ["n_chars", "doc_id"], rn_col="__rn")
    total = docs.agg(F.count(F.lit(1)).alias("__n"))
    b = base.crossJoin(F.broadcast(total))
    buckets = F.lit(_BUCKETS)
    qsize = F.floor(F.col("__n") / buckets)
    r = F.col("__n") % buckets
    big = r * (qsize + 1)
    rn = F.col("__rn")
    bucket = (
        F.when(rn <= big, F.floor((rn - 1) / (qsize + 1)) + 1)
        .otherwise(r + F.floor((rn - big - 1) / F.greatest(qsize, F.lit(1))) + 1)
        .cast("long")
    )
    return (
        b.select("doc_id", "n_chars", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_len"),
            F.max("n_chars").alias("max_len"),
            F.sum("n_chars").alias("sum_len"),
            (F.count("*") * F.max("n_chars") - F.sum("n_chars")).alias(
                "padding_waste"
            ),
        )
    )
