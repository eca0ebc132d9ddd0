"""Process-lifetime scratch directories for staging zones.

Replay, compaction, bucketed-join, transaction-log, and DPP queries all
stage data under ``tempfile.mkdtemp`` roots that must OUTLIVE the lazy
DataFrames read back from them (never per-call cleanup — the returned
snapshot is collected later by the caller). ``mkdtemp`` dirs do not die
at process exit though, so a long-lived host would leak one staging
copy per zone per run. This module is the middle ground: every zone
root is registered here and removed by ONE ``atexit`` hook — after all
in-process reads, before the OS would have to care.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOTS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` that self-cleans at interpreter exit."""
    path = tempfile.mkdtemp(prefix=prefix)
    _ROOTS.append(path)
    return path


@atexit.register
def _cleanup() -> None:
    while _ROOTS:
        shutil.rmtree(_ROOTS.pop(), ignore_errors=True)
