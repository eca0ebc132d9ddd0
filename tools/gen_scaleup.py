"""Deterministic scale-up of the driver testdata for large-SF parity.

Replicates /root/testdata/sf0.1 N times (default 10 → "sf1-class") into
an output directory, keeping both engines readable from the SAME parquet
files so oracle parity remains meaningful:

- every surrogate/foreign key is offset per replica by (max_key + 1) of
  the source table, preserving referential integrity replica-by-replica
  (nation/region stay fixed — they are fixed-size dims at every sf);
- event timestamps shift by replica_idx * 400 days so time-window
  self-joins scale linearly (10x rows → 10x pairs) instead of
  quadratically across replicas;
- document text is kept byte-identical across replicas — a deliberately
  dup-heavy corpus that stress-tests the dedup/LSH tier at 10x bucket
  sizes;
- embeddings get a per-replica perturbation on element 0 so cosine
  top-k has no cross-replica exact ties (tie order would otherwise be
  the only parity hazard).

Pure pyarrow/pandas — no Spark needed to generate. Deterministic:
same input → byte-identical output.

Usage: python tools/gen_scaleup.py [--src SRC] [--dst DST] [--factor N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: key columns to offset, per table: {column: table_whose_max_defines_stride}
KEYED = {
    "orders": {"o_orderkey": ("orders", "o_orderkey"), "o_custkey": ("customer", "c_custkey")},
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "events": {"event_id": ("events", "event_id"), "user_id": ("events", "user_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
COPY_ONLY = ("region", "nation")
EVENT_TS_SHIFT_US = 400 * 24 * 3600 * 1_000_000  # 400 days per replica


def _strides(src: str) -> dict[tuple[str, str], int]:
    out: dict[tuple[str, str], int] = {}
    for tbl_cols in KEYED.values():
        for _, (tbl, col) in tbl_cols.items():
            if (tbl, col) not in out:
                arr = pq.read_table(os.path.join(src, f"{tbl}.parquet"), columns=[col])
                out[(tbl, col)] = int(pc.max(arr.column(0)).as_py()) + 1
    return out


def scale_table(src: str, name: str, factor: int, strides) -> pa.Table:
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    replicas = []
    for i in range(factor):
        cols = {}
        for field in t.schema:
            c = t.column(field.name)
            if name in KEYED and field.name in KEYED[name]:
                stride = strides[KEYED[name][field.name]]
                c = pc.add(c, pa.scalar(i * stride, type=field.type))
            elif name == "events" and field.name == "ts":
                us = c.cast(pa.int64())
                us = pc.add(us, pa.scalar(i * EVENT_TS_SHIFT_US, type=pa.int64()))
                c = us.cast(field.type)
            elif name == "embeddings" and field.name == "embedding":
                vals = c.combine_chunks()
                flat = vals.values.to_numpy(zero_copy_only=False).copy()
                offsets = vals.offsets.to_numpy(zero_copy_only=False)
                # perturb element 0 of each vector per replica (break ties)
                flat[offsets[:-1]] += np.float32(i) * np.float32(1e-3)
                c = pa.ListArray.from_arrays(vals.offsets, pa.array(flat, type=pa.float32()))
            replicas_col = c
            cols[field.name] = replicas_col
        replicas.append(pa.table(cols))
    return pa.concat_tables(replicas)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sfbig"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    strides = _strides(args.src)
    for name in COPY_ONLY:
        pq.write_table(
            pq.read_table(os.path.join(args.src, f"{name}.parquet")),
            os.path.join(args.dst, f"{name}.parquet"),
        )
        print("copied", name)
    for name in KEYED:
        out = scale_table(args.src, name, args.factor, strides)
        pq.write_table(out, os.path.join(args.dst, f"{name}.parquet"), row_group_size=1 << 20)
        print("scaled", name, out.num_rows, "rows")


if __name__ == "__main__":
    main()
