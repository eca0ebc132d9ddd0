"""Repeated-run determinism for every consumer of the distributed
global-window machinery (`_ranged_with_offsets`).

Round-3 driver caught a nondeterministic hash mismatch on
`q_sequence_pack`: the old formulation (sampled repartitionByRange +
spark_partition_id + lazy localCheckpoint) could let the offsets branch
and the data branch observe different range boundaries when the
broadcast-exchange thread raced the unmaterialized checkpoint. The fix
makes __pid a pure function of row values; these tests pin that the
whole pipeline is now a value-deterministic function — same session,
five consecutive runs, bit-identical results.
"""

from __future__ import annotations

import hashlib

import pytest

from nyc_landmarks_datalake_spark import registry

registry.load_all()

N_RUNS = 5

CONSUMERS = [
    "q_sequence_pack",  # distributed_running_sum
    "q_rank_battery",  # distributed_row_number
    "q_cume_dist_acctbal",  # distributed_row_number
    "q_pareto_frontier",  # _ranged_with_offsets(agg="max")
]


def _result_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted(repr(tuple(r[c] for c in cols)) for r in df.collect())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", CONSUMERS)
def test_repeated_runs_bit_identical(spark, sf_small, name):
    fn = registry.QUERIES[name]
    hashes = {_result_hash(fn(spark, sf_small)) for _ in range(N_RUNS)}
    assert len(hashes) == 1, f"{name} produced {len(hashes)} distinct results"
