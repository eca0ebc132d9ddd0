"""Fail-loud completion guard for finite streaming replays.

``awaitTermination(timeout)`` returns ``False`` on timeout with the
query still RUNNING — reading the sink then would return a partial
mid-replay result (or nothing), a silently-wrong answer. Every replay
in this package funnels through :func:`finish_replay` so a hung replay
raises instead.
"""

from __future__ import annotations


def finish_replay(q, timeout_s: int, zone: str) -> None:
    """Block until the streaming query ``q`` terminates; raise on timeout."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(
            f"streaming replay ({zone}) did not finish within "
            f"{timeout_s}s; refusing to read a partial result"
        )
