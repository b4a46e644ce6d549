"""BPE tokenizer training and encoding over a document corpus.

The reference ships tokenizer helpers (fireworks/toolbox/text.py:7-28) but
no subword training; a pre-training data pipeline needs one. Architecture
follows every production BPE trainer (the corpus-scale part of BPE is ONLY
the word-frequency reduction — merges are then learned from the bounded
word-frequency table):

- ``train_bpe``: one distributed groupBy(word).count() — map-side combined,
  output bounded by |word vocab|, further capped by ``max_words`` (top by
  count, deterministic tiebreak) — then the classic greedy pair-merge loop
  driver-side over that table. At 100 TB the reduction is the only stage
  that sees the corpus; the merge loop sees at most ``max_words`` rows.
- ``bpe_encode``: applies the learned merge ranks per word inside
  mapInPandas (tokenizer application is genuinely per-symbol Python; the
  Arrow batches keep it off the row-at-a-time path).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fireworks_spark.operators.ranking import tokens
from fireworks_spark.operators.spread import spread

__all__ = ["train_bpe", "bpe_encode"]

_EOW = "</w>"


def train_bpe(
    df: DataFrame,
    num_merges: int = 50,
    text_col: str = "text",
    min_freq: int = 2,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus. Returns the ordered
    merge list [(left, right), ...]; ties break lexicographically so the
    result is deterministic for a given corpus."""
    wc = (
        spread(df)
        .select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(list(r["w"]) + [_EOW]): r["c"] for r in wc
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_freq:
            break
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document into BPE subtokens using a learned merge list.
    Returns (id_col, subtokens array<string>, n_subtokens)."""
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def _enc(batches):
        for b in batches:
            if not len(b):
                continue
            subs = []
            for text in b["_t"]:
                toks: list[str] = []
                for w in (text or "").split(" "):
                    if w:
                        toks.extend(_encode_word(w, ranks))
                subs.append(toks)
            yield pd.DataFrame(
                {"_id": b["_id"], "subtokens": subs, "n_subtokens": [len(s) for s in subs]}
            )

    return (
        spread(df)
        .select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .mapInPandas(_enc, "_id long, subtokens array<string>, n_subtokens long")
        .select(F.col("_id").alias(id_col), "subtokens", "n_subtokens")
    )
