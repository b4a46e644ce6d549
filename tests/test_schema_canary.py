"""Canary: pin the physical dtypes of every driver-generated test table.

The driver regenerates /root/testdata between rounds; a silent physical-type
change (e.g. events.ts drifting TIMESTAMP(NANOS) -> timestamp[us]/NTZ, which
broke 5 queries in round 3) should fail HERE, loudly naming the drifted
column, instead of surfacing as scattered query failures. The assertions pin
the *normalized* view the engine relies on (post tables.normalize_event_ts),
plus the raw physical type actually on disk so a new drift is visible even
when the normalizer happens to absorb it.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from fireworks_spark.tables import TABLES, table

# the dtypes every code path downstream assumes (normalized view, observed
# from the round-4 testdata generation — full columns so ANY drift names
# itself)
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # MUST be session-tz TIMESTAMP after normalize
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}

# raw physical types the normalizer knows how to absorb for events.ts
ABSORBABLE_TS = {"timestamp[ns]", "timestamp[us]", "timestamp[us, tz=UTC]"}


@pytest.mark.parametrize("name", TABLES)
def test_table_dtypes(spark, sf_dir, name):
    dtypes = dict(table(spark, sf_dir, name).dtypes)
    for col, want in EXPECTED.get(name, {}).items():
        got = dtypes.get(col)
        assert got == want, (
            f"testdata drift: {name}.{col} is {got!r}, engine assumes "
            f"{want!r} — update tables.normalize_event_ts / the query "
            f"code paths for the new physical type"
        )


def test_events_ts_physical_type_known(sf_dir):
    """If the driver writes events.ts in yet another physical type, name it
    here before any query trips over it."""
    raw = str(pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type)
    assert raw in ABSORBABLE_TS or raw == "int64", (
        f"events.ts physical type {raw!r} is new — teach "
        f"tables.normalize_event_ts about it"
    )


def test_embeddings_vector_column(spark, sf_dir):
    dtypes = dict(table(spark, sf_dir, "embeddings").dtypes)
    emb = dtypes.get("embedding")
    assert emb is not None and emb.startswith("array<"), (
        f"embeddings.embedding is {emb!r}; vector ops assume array<float/double>"
    )


def test_events_read_pins_utc(spark, sf_dir):
    """A driver session configured with a DST-bearing timezone must still
    read events as UTC wall-clock (table() pins session tz before the
    NTZ->TIMESTAMP cast); otherwise epoch deltas skew across transitions."""
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


def test_documents_text_nonempty_ascii(spark, sf_dir):
    """Several oracles assume documents.text is non-empty ASCII (q147's
    ord(char) byte model equals UTF-8 bytes only for ASCII; empty text
    would produce an absent row on the oracle side but a NULL-phash drop
    on the engine side). If the driver's fixture generation ever changes,
    fail HERE naming the assumption instead of as a scattered hash
    mismatch."""
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents")
    bad = d.filter(
        F.col("text").isNull()
        | (F.length("text") == 0)
        | F.col("text").rlike("[^\\x20-\\x7e]")
    ).count()
    assert bad == 0, (
        f"{bad} documents.text rows are empty or non-ASCII — the q147 "
        "oracle's ord()==UTF-8-byte model no longer holds; re-derive the "
        "oracle byte stream (and the empty-media row handling) first"
    )
