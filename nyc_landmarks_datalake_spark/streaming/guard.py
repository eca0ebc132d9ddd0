"""Fail-loud completion guard for finite streaming replays.

``awaitTermination(timeout)`` returns ``False`` on timeout with the
query still RUNNING — reading the sink then would return a partial
mid-replay result (or nothing), a silently-wrong answer. Every replay
in this package funnels through :func:`finish_replay` so a hung replay
raises instead.
"""

from __future__ import annotations


def replay_session(spark, shuffle_partitions: int = 8):
    """A cloned session with a low shuffle-partition count for finite
    replays.

    A stateful streaming query materializes one state-store instance
    per shuffle partition per stateful operator per micro-batch — at
    local replay scale (a few thousand rows) the parent session's 32
    partitions are pure store-provider overhead (the stream-stream
    outer join spent ~9% of the whole bench on it). Cloning
    (``newSession``: shared SparkContext, own SessionState) lets the
    replay run with few state partitions WITHOUT mutating the shared
    session's conf mid-query (the r9 rule). On a real cluster the
    caller passes a partition count sized to executor count × state
    volume instead.

    The replay's sink writes plain parquet, so the caller's session
    reads the result back with its own conf — cross-session handoff
    through the filesystem, no session-state coupling.
    """
    sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return sess


def finish_replay(q, timeout_s: int, zone: str) -> None:
    """Block until the streaming query ``q`` terminates; raise on timeout."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(
            f"streaming replay ({zone}) did not finish within "
            f"{timeout_s}s; refusing to read a partial result"
        )
