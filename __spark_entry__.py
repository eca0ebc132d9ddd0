"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator (SURVEY.md §2) to a (spark, sf_dir) →
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL the
driver compares against at sf0.01.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nyc_landmarks_datalake_spark import registry

registry.load_all()

SF0001_DIR = "/root/testdata/sf0.001"
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _verified_names() -> set[str]:
    """Query names with a fully-green driver CORRECTNESS row in any past round.

    The driver verifies a bounded prefix of ``queries()`` per round, so we
    rotate: queries that already have an independent green row yield their
    slot to ones that don't. Orderings only — names and semantics are stable.
    """
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # Green = ran without error and every recorded *_match flag is
            # true. At least one flag must actually be present — a row
            # whose comparison never produced flags is NOT verified.
            flags = [
                v for k, v in row.items() if k.endswith("_match") and v is not None
            ]
            if row.get("err") is None and flags and all(flags):
                green.add(name)
    return green - REVERIFY


#: queries whose implementation or oracle changed since their last green
#: driver row — their stale green flags must not excuse them from the
#: checked prefix. Maintained per round; clear entries once re-verified.
REVERIFY: frozenset[str] = frozenset(
    {
        # r15's single entry (q_label_propagation, post oracle-guard
        # text change) re-greened in CORRECTNESS_r15 — cleared.
        # r16 touches: the undirected co-purchase edge builder was
        # lifted out of oriented_copurchase_edges into copurchase_und
        # (shared with the new link-prediction/assortativity queries).
        # Semantically a no-op and parity-rechecked at sf0.001/0.01,
        # but the implementation text changed, so re-verify.
        "q_triangle_count",
        # r16: the triplicated pivot-selection + bitmask MS-BFS grow
        # loop was extracted into the shared ms_bfs_state driver
        # (r15 ADVICE) — values unchanged (full test_centrality +
        # sf0.01 parity re-run green), but the implementations of all
        # three riders changed, so re-verify.
        "q_harmonic_centrality",
        "q_closeness_eccentricity",
        "q_distance_distribution",
        # r16 optimization round: plans restructured for performance
        # (results proven hash-identical to the committed oracles at
        # sf0.001/0.01 before landing — see OPTIMIZATION_r16.md), but
        # the implementation text changed, so the driver re-checks:
        # FastSS blocking now joins on xxhash64(variant) with bounded
        # levenshtein (linkage trio)…
        "q_record_linkage",
        "q_linkage_weights",
        "q_fuzzy_join_names",
        # …the soft-dedup weight attachment broadcasts the cluster
        # relations…
        "q_soft_dedup_weights",
        # …and the remaining streaming replays moved onto the
        # low-state-partition replay_session clone (the stream_join
        # discipline), touching every replay-backed query body.
        "q_stateful_user_profiles",
        "q_stream_ingest_dedup",
        "q_stream_tumbling_replay",
        "q_stream_sliding_replay",
        "q_stream_session_replay",
        "q_stream_dedup",
        "q_stream_dedup_watermarked",
    }
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1-style pricing summary: scan → pushed filter → hash agg with
    decimal-exact sums — 6 groups with stable schema at every sf.
    """
    return registry.QUERIES["q01_pricing_summary"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so queries without a past green driver CORRECTNESS row come
    first (the driver checks a bounded prefix per round). Among the
    unverified, OLDER queries outrank newer ones (query_manifest.json
    records the round each name was registered) so additions never push
    long-waiting queries out of the checked prefix; ties keep
    registration order. Names and semantics never change.
    """
    green = _verified_names()
    try:
        with open(os.path.join(_REPO_DIR, "query_manifest.json")) as f:
            first_round = json.load(f)
    except (OSError, ValueError):
        first_round = {}
    # never-verified queries (of ANY round) outrank re-verifications,
    # which once held a green row on an older implementation
    ordered = sorted(
        registry.QUERIES,
        key=lambda name: (
            name in green,
            name in REVERIFY,
            first_round.get(name, 99),
        ),
    )
    return {name: registry.QUERIES[name] for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return dict(registry.ORACLE)
