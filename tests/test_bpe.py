"""BPE trainer/encoder tests with hand-computed merges (the classic
hug/pug/pun/bun/hugs frequency example)."""

from __future__ import annotations

from fireworks_spark.operators import bpe


def _corpus(spark):
    # word frequencies: hug 10, pug 5, pun 12, bun 4, hugs 5
    words = (
        ["hug"] * 10 + ["pug"] * 5 + ["pun"] * 12 + ["bun"] * 4 + ["hugs"] * 5
    )
    return spark.createDataFrame(
        [(0, " ".join(words[:18])), (1, " ".join(words[18:]))],
        "doc_id long, text string",
    )


def test_train_bpe_hand_computed_merges(spark):
    """First three merges computed by hand: (u,g) at 20, then the 16-16 tie
    between (n,</w>) and (u,n) breaks lexicographically to (n,</w>),
    then (u,n</w>) at 16."""
    merges = bpe.train_bpe(_corpus(spark), num_merges=3)
    assert merges == [("u", "g"), ("n", "</w>"), ("u", "n</w>")]


def test_bpe_encode_applies_ranks(spark):
    merges = bpe.train_bpe(_corpus(spark), num_merges=3)
    d = spark.createDataFrame(
        [(0, "hug pun zap"), (1, "")], "doc_id long, text string"
    )
    out = {r.doc_id: list(r.subtokens) for r in bpe.bpe_encode(d, merges).collect()}
    # hug -> h ug </w>; pun -> p un</w>; zap unseen -> chars + </w>
    assert out[0] == ["h", "ug", "</w>", "p", "un</w>", "z", "a", "p", "</w>"]
    assert out[1] == []


def test_train_bpe_min_freq_stops(spark):
    merges = bpe.train_bpe(_corpus(spark), num_merges=500, min_freq=10)
    # every learned merge occurred at least 10 times at its turn
    assert len(merges) < 20 and merges[0] == ("u", "g")
