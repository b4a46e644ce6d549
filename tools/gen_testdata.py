"""Generate a larger-scale test fixture with the SAME schemas and
distribution family as the driver's /root/testdata/sf* tables (TESTDATA.md:
seed-42 synthetic TPC-H-ish star schema + events/documents/embeddings).

The driver ships sf0.001/0.01/0.1 only; the sf1 oracle sweep (VERDICT r8
item 1) needs a 10x fixture. Exact byte-parity with the driver's generator
is NOT required — the differential harness runs Spark and DuckDB over the
SAME files — but schemas must match exactly (test_schema_canary pins them)
and distribution shapes should match so operator behavior (near-dup rate,
key skew, value ranges) carries over. Empirical anchors (vocabulary, part
names, lang mix, ~5%% trailing-" dup" near-duplicate documents) are read
from an existing driver fixture dir rather than hard-coded.

Usage:
    python tools/gen_testdata.py --sf 1 --out /root/repo/testdata_sf1 \
        [--ref /root/testdata/sf0.1]

Scale rule (rows at sf=1, matching the driver's 10x-per-decade ladder):
customer 150k, supplier 10k, part 200k, orders 1.5M, lineitem 6M,
events 1M, documents 50k, embeddings 20k.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(sf: float, out: str, ref: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation: fixed dimension tables — copy from the driver fixture
    for t in ("region", "nation"):
        pq.write_table(
            pq.read_table(os.path.join(ref, f"{t}.parquet")),
            os.path.join(out, f"{t}.parquet"),
        )
        print(f"  {t}: copied from {ref}")

    # empirical anchors from the reference fixture
    refdocs = pq.read_table(
        os.path.join(ref, "documents.parquet"), columns=["text", "lang"]
    )
    texts = refdocs.column("text").to_pylist()
    vocab = sorted({w for t in texts[:2000] for w in t.split(" ")} - {"dup"})
    langs, lang_counts = np.unique(
        np.asarray(refdocs.column("lang")), return_counts=True
    )
    lang_p = lang_counts / lang_counts.sum()
    refpart = pq.read_table(
        os.path.join(ref, "part.parquet"),
        columns=["p_name", "p_brand", "p_type"],
    )
    part_names = sorted(set(refpart.column("p_name").to_pylist()))
    part_brands = sorted(set(refpart.column("p_brand").to_pylist()))
    part_types = sorted(set(refpart.column("p_type").to_pylist()))

    # ---- customer ----------------------------------------------------
    ck = np.arange(n_cust, dtype=np.int64)
    _write(out, "customer", pa.table({
        "c_custkey": ck,
        "c_name": pa.array([f"Customer#{i:09d}" for i in ck]),
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            rng.choice(
                ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                 "MACHINERY"], n_cust,
            )
        ),
    }))

    # ---- supplier ----------------------------------------------------
    sk = np.arange(n_supp, dtype=np.int64)
    _write(out, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": pa.array([f"Supplier#{i:09d}" for i in sk]),
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # ---- part --------------------------------------------------------
    pk = np.arange(n_part, dtype=np.int64)
    _write(out, "part", pa.table({
        "p_partkey": pk,
        "p_name": pa.array(rng.choice(part_names, n_part)),
        "p_brand": pa.array(rng.choice(part_brands, n_part)),
        "p_type": pa.array(rng.choice(part_types, n_part)),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        # driver fixture: retailprice = 900 + (partkey % 1000) / 10
        "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 2),
    }))

    # ---- orders ------------------------------------------------------
    ok = np.arange(n_ord, dtype=np.int64)
    d0 = np.datetime64("1995-01-01")
    span_days = int(
        (np.datetime64("2001-08-02") - d0) / np.timedelta64(1, "D")
    )
    odate = (
        d0 + rng.integers(0, span_days, n_ord).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    _write(out, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], n_ord)),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                 "5-LOW"], n_ord,
            )
        ),
    }))

    # ---- lineitem ----------------------------------------------------
    lk = rng.integers(0, n_ord, n_li).astype(np.int64)
    # linenumber = 1..k within each order (sort by orderkey, cumcount)
    order_sorted = np.argsort(lk, kind="stable")
    ln = np.empty(n_li, dtype=np.int32)
    sorted_keys = lk[order_sorted]
    starts = np.flatnonzero(
        np.r_[True, sorted_keys[1:] != sorted_keys[:-1]]
    )
    seq = np.arange(n_li, dtype=np.int64)
    ln[order_sorted] = (
        seq - np.repeat(starts, np.diff(np.r_[starts, n_li])) + 1
    ).astype(np.int32)
    sdate = (
        d0 + rng.integers(0, span_days, n_li).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    _write(out, "lineitem", pa.table({
        "l_orderkey": lk,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": ln,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))

    # ---- events (ts strictly increasing with event_id, 30-day span) --
    t0 = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 24 * 3600 * 1_000_000
    gaps = rng.exponential(span_us / n_ev, n_ev)
    cum = np.cumsum(gaps)
    # rescale into the span instead of clamping: a clamp piles the tail
    # (~O(sqrt(n)) events whenever the cumsum overshoots) onto one
    # identical final microsecond, breaking the documented
    # strictly-increasing shape; rescaling preserves it (microsecond
    # collisions after int-truncation are possible but not systematic)
    cum = cum * ((span_us - 1) / cum[-1])
    ts = t0 + cum.astype(np.int64).astype("timedelta64[us]")
    n_users = int(15_000 * sf)
    _write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": rng.integers(0, max(n_users, 1), n_ev).astype(np.int64),
        "event_type": pa.array(
            rng.choice(
                ["click", "view", "purchase", "signup", "error"], n_ev
            )
        ),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]
        ),
    }))

    # ---- documents (~5% trailing-" dup" near-duplicates) -------------
    doc_texts: list[str] = []
    is_dup = rng.random(n_doc) < 0.05
    for i in range(n_doc):
        if is_dup[i] and doc_texts:
            src_i = int(rng.integers(0, len(doc_texts)))
            doc_texts.append(doc_texts[src_i] + " dup")
        else:
            nw = int(rng.integers(10, 101))
            doc_texts.append(
                " ".join(rng.choice(vocab, nw))
            )
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": pa.array(doc_texts),
        "lang": pa.array(rng.choice(langs, n_doc, p=lang_p)),
        "source": pa.array(
            [f"src{j}" for j in rng.integers(0, 20, n_doc)]
        ),
        "n_chars": np.asarray(
            [len(t) for t in doc_texts], dtype=np.int64
        ),
    }))

    # ---- embeddings (unit-norm, 64-dim, 10 uniform labels) -----------
    M = rng.standard_normal((n_emb, 64)).astype(np.float32)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(M.reshape(-1), pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_emb).astype(np.int32),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument("--ref", default="/root/testdata/sf0.1")
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    print(f"generating sf={a.sf} into {a.out} (ref={a.ref}, seed={a.seed})")
    generate(a.sf, a.out, a.ref, a.seed)
    print("done")
