"""Semantics pins for the web-curation tier (operators/webcuration.py).
Oracle value parity is covered by tests/test_oracle_parity.py."""

from __future__ import annotations

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.sources.catalog import table

registry.load_all()


def test_url_aliases_collapse(spark, sf_small):
    """Port/param-order variants of the same logical URL must dedupe:
    canonical distinct < raw distinct overall, and never exceeds it."""
    rows = registry.QUERIES["q_url_canonicalize"](spark, sf_small).collect()
    assert rows
    assert all(r.n_canon_distinct <= r.n_raw_distinct for r in rows)
    assert sum(r.n_canon_distinct for r in rows) < sum(
        r.n_raw_distinct for r in rows
    )
    assert all(r.host == r.host.lower() for r in rows)


def test_pii_found_and_redacted(spark, sf_small):
    """Every constructed record embeds exactly one email and one phone;
    redaction must shrink/normalize them away (length strictly drops —
    '<EMAIL>' is shorter than any constructed address)."""
    rows = registry.QUERIES["q_pii_redaction"](spark, sf_small).collect()
    n_docs = sum(r.n_docs for r in rows)
    assert n_docs == table(spark, sf_small, "customer").count()
    assert sum(r.n_emails for r in rows) == n_docs
    assert sum(r.n_phones for r in rows) == n_docs


def test_length_buckets_partition_the_corpus(spark, sf_small):
    """NTILE(16): every doc in exactly one bucket, bucket sizes within
    one of each other, waste nonnegative and bounded by n*(max-min)."""
    rows = registry.QUERIES["q_length_bucket_batching"](spark, sf_small).collect()
    assert len(rows) == 16
    total = sum(r.n_docs for r in rows)
    assert total == table(spark, sf_small, "documents").count()
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0 <= r.padding_waste <= r.n_docs * (r.max_len - r.min_len)
