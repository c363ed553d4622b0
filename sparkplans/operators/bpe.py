"""Byte-pair-encoding merge training as DataFrame ops.

The counting recipe behind every BPE/WordPiece tokenizer build
(GPT-2's `bpe.py`, Sennrich et al. 2016), distributed the Spark way:

- The corpus collapses to a **word-frequency table** first (one
  shuffle); every later pass runs on unique words weighted by count —
  vocabulary-sized, not corpus-sized.  This is the property that
  makes tokenizer training on a 100 TB corpus a small-data problem
  after one aggregation.
- Each merge step counts adjacent symbol pairs (weighted by word
  frequency), picks the argmax — **driver-side model state**, like
  the k-means centroids in `similarity.ivf_build` — and rewrites the
  symbol arrays with a left-to-right fold, the exact merge semantics
  of the reference implementations.
- Determinism: ties on pair count break lexicographically, so the
  learned merge list is a pure function of the corpus.

``bpe_encode`` applies a trained table the scalable way: broadcast
the (word → symbols) lookup learned at train time; unseen words fall
back to character splits.  (Production tokenizers apply merges with
a linear-scan automaton; the lookup join IS that automaton for every
word the training corpus has seen.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from sparkplans.materialize import materialize, materialize_lazy


def _char_split(col) -> F.Column:
    """Split a string into single-character symbols (regex lookahead:
    split at every position except the start; the end-of-string match
    leaves a trailing empty element — dropped)."""
    return F.filter(F.split(col, r"(?!^)"), lambda x: x != "")


def _word_freq(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    words = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("n"))


def _merge_fold(arr, a: str, b: str) -> F.Column:
    """Left-to-right BPE merge of adjacent (a, b) into a+b — the fold
    mirrors the reference implementations' scan, including the
    no-remerge-with-own-output subtlety ([a,a,a] with merge (a,a)
    yields [aa, a])."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(lab)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
) -> tuple[list, DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns ``(merges, vocab)``: ``merges`` is an ordered list of
    ``(left, right, weight)`` and ``vocab`` the word-frequency table
    with the final ``symbols`` arrays.

    One corpus-wide shuffle total (the word count); each of the
    ``num_merges`` iterations is a pair-count aggregation over the
    vocabulary plus a 1-row argmax collect.  The vocab frame is
    localCheckpoint-ed per iteration so plan depth stays constant.
    """
    vocab = (
        _word_freq(docs, text_col)
        .withColumn("symbols", _char_split(F.col("word")))
        .transform(materialize_lazy)
    )
    merges: list = []
    for _ in range(num_merges):
        pairs = vocab.select(
            "n",
            F.explode(
                F.filter(
                    F.zip_with(
                        F.col("symbols"),
                        F.slice(
                            F.col("symbols"),
                            2,
                            F.greatest(
                                F.size("symbols") - 1, F.lit(0)
                            ),
                        ),
                        lambda x, y: F.struct(
                            x.alias("a"), y.alias("b")
                        ),
                    ),
                    lambda s: s["b"].isNotNull(),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("w"))
            .orderBy(F.desc("w"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["w"] is None:
            break
        a, b, w = top[0]["p"]["a"], top[0]["p"]["b"], int(top[0]["w"])
        merges.append((a, b, w))
        vocab = vocab.withColumn(
            "symbols", _merge_fold(F.col("symbols"), a, b)
        ).transform(materialize_lazy)
    return merges, vocab


def bpe_encode(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize ``docs`` with a trained vocab: per (doc, word
    position), look up the word's learned symbol array (broadcast
    join — the trained vocab is model-sized); out-of-vocabulary words
    fall back to character symbols.  Returns (id, pos, word, tokens
    array).  The corpus never shuffles."""
    words = docs.select(
        id_col,
        F.posexplode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("pos", "word"),
    ).filter(F.col("word") != "")
    lut = vocab.select("word", F.col("symbols").alias("__sym"))
    return words.join(F.broadcast(lut), "word", "left").select(
        id_col,
        "pos",
        "word",
        F.coalesce(
            F.col("__sym"), _char_split(F.col("word"))
        ).alias("tokens"),
    )
