"""Fail-loud completion guard for finite streaming replays.

``awaitTermination(timeout)`` returns ``False`` on timeout with the
query still RUNNING — reading the sink then would return a partial
mid-replay result (or nothing), a silently-wrong answer. Every replay
in this package funnels through :func:`finish_replay` so a hung replay
raises instead.
"""

from __future__ import annotations

#: one cached clone per (application, partition count) — replays used
#: to call ``newSession()`` per invocation, leaking a SessionState (and
#: its listener/conf machinery) each time a replay query ran. Keyed on
#: applicationId (not ``id(sparkContext)``: CPython reuses id() after
#: GC, so a restarted context could collide with a dead clone's key)
#: and validated for liveness before reuse.
_REPLAY_SESSIONS: dict[tuple[str, int], object] = {}


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

    The clone is CACHED per (SparkContext, partition count) and reused
    across replays: each replay runs to completion before the next
    starts (finish_replay blocks) and leaves no state behind — sinks
    are per-call tmp dirs and no temp views are registered — so a
    fresh SessionState per invocation bought nothing and accumulated
    one leaked clone per replayed query for the life of the JVM.
    """
    key = (spark.sparkContext.applicationId, shuffle_partitions)
    sess = _REPLAY_SESSIONS.get(key)
    if sess is not None:
        # a cached clone can outlive its context (stop() + new session
        # in tests): hand back only a clone that shares the CALLER's
        # live context, else rebuild.
        try:
            alive = (
                sess.sparkContext is spark.sparkContext
                and not sess.sparkContext._jsc.sc().isStopped()
            )
        except Exception:
            alive = False
        if not alive:
            _REPLAY_SESSIONS.pop(key, None)
            sess = None
    if sess is None:
        sess = spark.newSession()
        sess.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        _REPLAY_SESSIONS[key] = sess
    return sess


def finish_replay(q, timeout_s: int, zone: str) -> None:
    """Block until the streaming query ``q`` terminates; raise on timeout."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(
            f"streaming replay ({zone}) did not finish within "
            f"{timeout_s}s; refusing to read a partial result"
        )
