"""Emit the headline counts for STATUS.md from the ground truth itself.

r7 VERDICT #6: STATUS.md's hand-edited "218/590" drifted from the actual
219/592 within one round. This script derives every number it prints —
registry size from ``len(registry.QUERIES)``, oracle coverage from
``registry.ORACLE``/``ROWS_ONLY``, bench query count from
``bench.HEADLINE``, driver-verification progress from the committed
CORRECTNESS_r*.json artifacts — and takes the one number it cannot
derive (the pytest summary) verbatim from a pytest output line passed on
the command line, refusing to run without it.

Usage (end-of-round ritual):

    python -m pytest tests/ -q 2>&1 | tail -1   # e.g. "593 passed, 1 skipped in 450s"
    python tools/headline_counts.py --pytest-line "593 passed, 1 skipped in 450s"

Writes HEADLINE_COUNTS.json and prints the STATUS.md-ready line. The
`Headline counts:` line in STATUS.md is pinned to the registry by
tests/test_plans.py::test_status_headline_counts_match_registry.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _driver_green() -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
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
            flags = [v for k, v in row.items() if k.endswith("_match") and v is not None]
            if row.get("err") is None and flags and all(flags):
                green.add(name)
    return green


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--pytest-line",
        help='the pytest summary line, e.g. "593 passed, 1 skipped in 450s"',
    )
    ap.add_argument(
        "--pre-driver",
        action="store_true",
        help="stamp the output as computed BEFORE this round's driver "
        "pass (end-of-round ritual): the driver_green numbers lag by "
        "the checked prefix and the file says so explicitly",
    )
    ap.add_argument(
        "--list-pending",
        action="store_true",
        help="print every registry query WITHOUT a green driver "
        "CORRECTNESS row (the verification gap) and exit non-zero if "
        "any exist; no artifacts written",
    )
    args = ap.parse_args()

    if args.list_pending:
        from nyc_landmarks_datalake_spark import registry

        registry.load_all()
        # REVERIFY names have stale green rows (implementation or oracle
        # changed since) — they are part of the gap, annotated as such
        import __spark_entry__ as entry

        pending = sorted(
            set(registry.QUERIES) - (_driver_green() - entry.REVERIFY)
        )
        for name in pending:
            tag = "  (REVERIFY)" if name in entry.REVERIFY else ""
            print(f"{name}{tag}")
        print(f"pending: {len(pending)} of {len(registry.QUERIES)}")
        return 1 if pending else 0

    if not args.pytest_line:
        ap.error("--pytest-line is required unless --list-pending")

    m = re.search(r"(\d+) passed", args.pytest_line)
    if not m:
        print("pytest line has no '<N> passed'", file=sys.stderr)
        return 2
    passed = int(m.group(1))
    sk = re.search(r"(\d+) skipped", args.pytest_line)
    skipped = int(sk.group(1)) if sk else 0
    fl = re.search(r"(\d+) failed", args.pytest_line)
    failed = int(fl.group(1)) if fl else 0

    from nyc_landmarks_datalake_spark import registry

    registry.load_all()
    import bench

    n_queries = len(registry.QUERIES)
    n_oracle = len(registry.ORACLE)
    n_rows_only = len(getattr(registry, "ROWS_ONLY", ()))
    green = _driver_green() & set(registry.QUERIES)
    counts = {
        "registered_queries": n_queries,
        "oracle_checked": n_oracle,
        "rows_only": n_rows_only,
        "bench_tracked": len(bench.HEADLINE),
        "driver_green_ever": len(green),
        "never_driver_green": n_queries - len(green),
        "pytest_passed": passed,
        "pytest_skipped": skipped,
        "pytest_failed": failed,
        # True = generated at end-of-round, BEFORE the driver runs its
        # checked prefix: driver_green_ever lags by up to one prefix.
        # The r9/r10 judges both flagged the un-stamped lag as
        # confusing; now the file is self-describing.
        "pre_driver": bool(args.pre_driver),
    }
    with open(os.path.join(_REPO, "HEADLINE_COUNTS.json"), "w") as f:
        json.dump(counts, f, indent=2)
        f.write("\n")
    print(
        f"Headline counts: {n_queries} registered queries "
        f"({n_oracle} oracle-checked, {n_rows_only} rows-only), "
        f"{len(bench.HEADLINE)} bench-tracked; driver-green ever: "
        f"{len(green)} ({n_queries - len(green)} pending); pytest: "
        f"{passed} passed, {skipped} skipped, {failed} failed."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
