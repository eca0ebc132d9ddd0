"""Native scale-factor generation of the parity test schema.

The 10x replication path (tools/gen_scaleup.py) grows key cardinality
but preserves per-replica value distributions — group counts per key
don't drift the way a genuinely larger generation would. This generator
synthesizes every table NATIVELY at a target sf: cardinalities scale
with sf (customers 150k*sf, orders 1.5M*sf, lineitem ~6M*sf, events
1M*sf, documents 50k*sf, embeddings 20k*sf), per-key fan-outs are drawn
fresh (1-7 lineitems per order, zipf-ish user activity in events), and
the dedup corpus mixes organic near-dup templates and exact dups at
sf-independent RATES so LSH bucket sizes grow with the corpus.

Schemas and value domains mirror /root/testdata (same column names,
arrow types, category sets, date ranges) so every registered query and
its DuckDB oracle run unchanged on the output. region/nation are
fixed-size dims copied from the source dir, as at every real sf.

Pure numpy/pyarrow — deterministic for a given (sf, seed).

Usage: python tools/gen_native.py [--sf 1.0] [--dst DIR] [--src SRC]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US_PER_DAY = 86_400_000_000
EPOCH_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
ORDER_DATE_DAYS = 2404  # 1995-01-01 .. 2001-08-01 inclusive-ish
EVENTS_T0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
EVENTS_SPAN_US = 30 * US_PER_DAY

SEGMENTS = ["BUILDING", "MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]
ADJS = ["small", "red", "blue", "hot", "cold", "big", "dark", "light", "fast", "slow"]
NOUNS = ["ring", "widget", "bolt", "gear", "gizmo", "cog", "wheel", "pin", "rod", "cap"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "en", "en", "fr", "es", "de", "zh"]  # en-heavy like real corpora
VOCAB = (
    "spark query table column row scan filter join group agg sort hash merge "
    "stream batch window state key value part order line customer vector "
    "small big fast slow the a data lake bronze silver gold plan shuffle"
).split()


def _money(rng: np.random.Generator, n: int, lo: float, hi: float) -> np.ndarray:
    return np.round(rng.uniform(lo, hi, n), 2)


def _write(dst: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table, os.path.join(dst, f"{name}.parquet"), row_group_size=1 << 20
    )
    print(f"wrote {name}: {table.num_rows} rows")


def gen_customer(rng, n) -> pa.Table:
    keys = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "c_custkey": keys,
            "c_name": pa.array([f"Customer#{k:09d}" for k in keys]),
            "c_nationkey": rng.integers(0, 25, n).astype(np.int32),
            "c_acctbal": _money(rng, n, -999.99, 9999.99),
            "c_mktsegment": pa.array([SEGMENTS[i] for i in rng.integers(0, 5, n)]),
        }
    )


def gen_supplier(rng, n) -> pa.Table:
    keys = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "s_suppkey": keys,
            "s_name": pa.array([f"Supplier#{k:09d}" for k in keys]),
            "s_nationkey": rng.integers(0, 25, n).astype(np.int32),
            "s_acctbal": _money(rng, n, -999.99, 9999.99),
        }
    )


def gen_part(rng, n) -> pa.Table:
    keys = np.arange(n, dtype=np.int64)
    adj = rng.integers(0, len(ADJS), n)
    noun = rng.integers(0, len(NOUNS), n)
    return pa.table(
        {
            "p_partkey": keys,
            "p_name": pa.array([f"{ADJS[a]} {NOUNS[b]}" for a, b in zip(adj, noun)]),
            "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n)]),
            "p_type": pa.array([PTYPES[i] for i in rng.integers(0, len(PTYPES), n)]),
            "p_size": rng.integers(1, 51, n).astype(np.int32),
            "p_retailprice": np.round(900.0 + keys * 0.1, 2),
        }
    )


def gen_orders(rng, n, n_cust) -> pa.Table:
    keys = np.arange(n, dtype=np.int64)
    days = rng.integers(0, ORDER_DATE_DAYS, n)
    odate = EPOCH_1995 + days * US_PER_DAY
    # 2/3 of customers place orders (TPC-H posture: q13/q22 see holes)
    cust = rng.integers(0, max(1, (n_cust * 2) // 3), n).astype(np.int64) * 3 // 2
    status = np.where(
        days > ORDER_DATE_DAYS - 400, "O", np.where(rng.random(n) < 0.05, "P", "F")
    )
    return pa.table(
        {
            "o_orderkey": keys,
            "o_custkey": cust,
            "o_orderstatus": pa.array(status.tolist()),
            "o_totalprice": _money(rng, n, 1000.0, 500000.0),
            "o_orderdate": pa.array(odate, type=pa.timestamp("us")),
            "o_orderpriority": pa.array(
                [PRIORITIES[i] for i in rng.integers(0, 5, n)]
            ),
        }
    )


def gen_lineitem(rng, orders: pa.Table, n_part, n_supp) -> pa.Table:
    okeys = orders.column("o_orderkey").to_numpy()
    odates = orders.column("o_orderdate").cast(pa.int64()).to_numpy()
    fan = rng.integers(1, 8, len(okeys))  # 1..7 lines/order, avg 4
    l_orderkey = np.repeat(okeys, fan)
    l_odate = np.repeat(odates, fan)
    n = len(l_orderkey)
    linenumber = (
        np.arange(n, dtype=np.int64) - np.repeat(np.cumsum(fan) - fan, fan) + 1
    ).astype(np.int32)
    qty = rng.integers(1, 51, n).astype(np.float64)
    ship_lag = rng.integers(1, 121, n)
    sdate = l_odate + ship_lag * US_PER_DAY
    cutoff = EPOCH_1995 + (ORDER_DATE_DAYS - 300) * US_PER_DAY
    shipped = sdate <= cutoff
    returnflag = np.where(shipped, np.where(rng.random(n) < 0.5, "R", "A"), "N")
    linestatus = np.where(shipped, "F", "O")
    return pa.table(
        {
            "l_orderkey": l_orderkey,
            "l_partkey": rng.integers(0, n_part, n).astype(np.int64),
            "l_suppkey": rng.integers(0, n_supp, n).astype(np.int64),
            "l_linenumber": linenumber,
            "l_quantity": qty,
            "l_extendedprice": np.round(qty * rng.uniform(900.0, 1100.0, n), 2),
            "l_discount": np.round(rng.integers(0, 11, n) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, n) * 0.01, 2),
            "l_returnflag": pa.array(returnflag.tolist()),
            "l_linestatus": pa.array(linestatus.tolist()),
            "l_shipdate": pa.array(sdate, type=pa.timestamp("us")),
        }
    )


def gen_events(rng, n, n_users) -> pa.Table:
    # zipf-ish user activity: square a uniform so low ids are hot —
    # realistic skew for the session/as-of/salted-join tier
    u = rng.random(n)
    user = (u * u * n_users).astype(np.int64)
    ts = np.sort(EVENTS_T0 + (rng.random(n) * EVENTS_SPAN_US).astype(np.int64))
    return pa.table(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": user,
            "event_type": pa.array(
                [EVENT_TYPES[i] for i in rng.integers(0, 5, n)]
            ),
            "value": np.round(rng.exponential(60.0, n), 2),
            "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
        }
    )


def _word_salad(rng, lo=30, hi=70) -> str:
    k = int(rng.integers(lo, hi))
    return " ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), k))


def gen_documents(rng, n) -> pa.Table:
    """Dup-heavy corpus at sf-independent rates: ~78% organic word
    salads, ~15% near-dups (template with a few word substitutions —
    the MinHash/Jaccard/SimHash tier's bread and butter), ~7% exact
    dups of an earlier doc. Template count scales with n so bucket
    sizes grow with the corpus instead of one mega-template."""
    n_templates = max(4, n // 250)
    templates = [_word_salad(rng).split() for _ in range(n_templates)]
    texts: list[str] = []
    for _ in range(n):
        r = rng.random()
        if texts and r < 0.07:  # exact dup
            texts.append(texts[int(rng.integers(0, len(texts)))])
        elif r < 0.22:  # near dup: mutate 1-3 words of a template
            words = list(templates[int(rng.integers(0, n_templates))])
            for _m in range(int(rng.integers(1, 4))):
                words[int(rng.integers(0, len(words)))] = VOCAB[
                    int(rng.integers(0, len(VOCAB)))
                ]
            texts.append(" ".join(words))
        else:
            texts.append(_word_salad(rng))
    return pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[i] for i in rng.integers(0, len(LANGS), n)]),
            "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n)]),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(rng, n, dim=64, n_labels=10) -> pa.Table:
    """Clustered vectors: label-derived centers + gaussian noise, so
    IVF/ANN and embedding-near-dup queries see real cluster structure."""
    labels = rng.integers(0, n_labels, n).astype(np.int32)
    centers = rng.normal(0.0, 1.0, (n_labels, dim)).astype(np.float32)
    vecs = centers[labels] + rng.normal(0.0, 0.35, (n, dim)).astype(np.float32)
    flat = pa.array(vecs.reshape(-1), type=pa.float32())
    offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    return pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.ListArray.from_arrays(offsets, flat),
            "label": labels,
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--dst",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".sfnative",
        ),
    )
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    sf = args.sf

    for name in ("region", "nation"):  # fixed-size dims at every sf
        pq.write_table(
            pq.read_table(os.path.join(args.src, f"{name}.parquet")),
            os.path.join(args.dst, f"{name}.parquet"),
        )
        print(f"copied {name}")

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    _write(args.dst, "customer", gen_customer(rng, n_cust))
    _write(args.dst, "supplier", gen_supplier(rng, n_supp))
    _write(args.dst, "part", gen_part(rng, n_part))
    orders = gen_orders(rng, n_orders, n_cust)
    _write(args.dst, "orders", orders)
    _write(args.dst, "lineitem", gen_lineitem(rng, orders, n_part, n_supp))
    _write(args.dst, "events", gen_events(rng, int(1_000_000 * sf), int(15_000 * sf)))
    _write(args.dst, "documents", gen_documents(rng, int(50_000 * sf)))
    _write(args.dst, "embeddings", gen_embeddings(rng, int(20_000 * sf)))
    with open(os.path.join(args.dst, "GENERATED.json"), "w") as f:
        json.dump({"sf": sf, "seed": args.seed, "generator": "gen_native.py"}, f)


if __name__ == "__main__":
    main()
