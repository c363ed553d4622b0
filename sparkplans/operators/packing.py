"""Distributed sequence packing — fixed-token-budget training batches.

LLM pre-training consumes fixed-length sequences (a context window of
`budget` tokens); packing variable-length documents into as few
sequences as possible is a bin-packing problem that every large-scale
training-data pipeline runs as its last step.  This operator is the
Spark-first version:

- **Partition-local first-fit-decreasing (FFD).**  Docs hash-partition
  by id into `parts` groups (one shuffle — the only one); each group
  packs independently with FFD inside an Arrow-batched
  ``applyInPandas`` (bin packing is inherently sequential decision
  logic — the one shape where per-group Python IS the idiomatic Spark
  plan; the inner loop is numpy-vectorized over bin capacities).
- **Quality is provable, not hoped for.**  First-fit guarantees at
  most ONE bin per partition ends at most half-full (two such bins
  cannot coexist: the later bin's first item would have fit in the
  earlier), so global waste is bounded by ``parts * budget/2`` plus
  slack inside >half-full bins; FFD's classic 11/9·OPT+6/9 bound holds
  per partition.  ``tests/test_packing.py`` pins both.
- **100 TB shape.**  Per-partition state is one int64 capacity array;
  choose `parts` so a partition holds ~1-10M docs and the numpy
  first-fit scan stays memory-bandwidth bound.  Sequence ids are
  globally unique without coordination: ``part * 2^40 + local``.

Oversized docs (size > budget) are EXCLUDED from the output — route
them through :func:`split_doc_chunks` first; silently clipping here
would corrupt token accounting.

Beyond the reference's operator inventory (it has no training-data
operators); first-class per the build brief's LLM-pipeline mandate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

_SEQ_STRIDE = 1 << 40


def split_doc_chunks(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    budget: int,
) -> DataFrame:
    """Split each document's whitespace-token stream into consecutive
    chunks of at most `budget` tokens — the truncation/split stage
    that feeds oversized documents into :func:`pack_sequences`.

    Entirely JVM-side (split → explode(sequence) → slice → join): a
    pure pipelined projection+generate with ZERO shuffles at any
    scale, and exactly SQL-expressible, so the registry query built on
    it is hash-oracled rather than invariant-oracled.

    Returns one row per chunk: the id column, ``chunk_idx`` (0-based,
    int), ``n_chunk_tokens`` (long), and ``chunk_text`` (the chunk
    re-joined with single spaces — token-exact, whitespace-normalized
    like every tokenizer consumer downstream expects).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    t = df.select(F.col(id_col), toks.alias("_toks"))
    n_chunks = F.ceil(F.size("_toks") / F.lit(budget)).cast("int")
    c = t.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.slice("_toks", F.col("chunk_idx") * budget + 1, F.lit(budget))
    return c.select(
        id_col,
        "chunk_idx",
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    size_col: str,
    budget: int,
    parts: int | None = None,
    part_col: str = "_pack_part",
) -> DataFrame:
    """Pack rows of `df` into sequences of at most `budget` tokens.

    Returns the eligible rows (``size_col <= budget``) with two added
    columns: ``seq_id`` (globally unique sequence id, long) and
    ``seq_pos`` (0-based position within the sequence, int).  The
    result is deterministic for a given (`df`, `parts`): partitioning
    is ``xxhash64(id) % parts`` and ties inside FFD break by id.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if parts is None:
        parts = df.sparkSession.sparkContext.defaultParallelism
    if parts <= 0:
        raise ValueError(f"parts must be positive, got {parts}")

    eligible = df.filter(F.col(size_col) <= F.lit(budget))
    keyed = eligible.withColumn(
        part_col,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(parts)).cast("int"),
    )
    out_schema = StructType(
        keyed.schema.fields
        + [StructField("seq_id", LongType()), StructField("seq_pos", IntegerType())]
    )

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf[part_col].iloc[0])
        # decreasing size, id-ascending within equal sizes => deterministic
        order = np.lexsort((pdf[id_col].to_numpy(), -pdf[size_col].to_numpy()))
        sizes = pdf[size_col].to_numpy()[order].astype(np.int64)
        n = len(sizes)
        remaining = np.empty(n, dtype=np.int64)  # capacity of bin b, b < nbins
        bin_of = np.empty(n, dtype=np.int64)
        pos_of = np.empty(n, dtype=np.int32)
        counts = np.zeros(n, dtype=np.int32)
        nbins = 0
        for i in range(n):
            s = sizes[i]
            fit = np.nonzero(remaining[:nbins] >= s)[0]
            if fit.size:
                b = int(fit[0])
            else:
                b = nbins
                nbins += 1
                remaining[b] = budget
            remaining[b] -= s
            bin_of[i] = b
            pos_of[i] = counts[b]
            counts[b] += 1
        res = pdf.iloc[order].copy()
        res["seq_id"] = part * _SEQ_STRIDE + bin_of
        res["seq_pos"] = pos_of
        return res

    return (
        keyed.groupBy(part_col)
        .applyInPandas(_ffd, schema=out_schema)
        .drop(part_col)
    )
