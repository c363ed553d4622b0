"""Text-analysis functions for the training-data pipeline operators.

Designed to run JVM-side (built-in expressions, whole-stage codegen —
no Python UDFs in the hot path) and to have exact DuckDB-SQL
equivalents so every operator built on them can be oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(text: Column | str) -> Column:
    """Whitespace-token count.

    DuckDB equivalent: ``len(regexp_split_to_array(trim(text), '\\s+'))``.
    """
    return F.size(F.split(F.trim(_c(text)), r"\s+"))


BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"
)


def bpe_token_count(text: Column | str) -> Column:
    """BPE-style pre-tokenizer count — a GPT-2-ish split into
    contraction suffixes / letter runs / digit runs / punctuation runs
    (the lookahead-free subset, so Java regex and DuckDB RE2 agree).
    Counts pre-tokens, the unit BPE merges operate on; a good
    proxy-for-cost signal when the real tokenizer isn't on the
    cluster.

    DuckDB equivalent:
    ``len(regexp_extract_all(text, <BPE_SPLIT_PATTERN>))``.
    """
    return F.regexp_count(_c(text), F.lit(BPE_SPLIT_PATTERN))


def ngrams(text: Column | str, n: int = 3) -> Column:
    """Character n-gram (shingle) array of a string, JVM-side:
    ``transform(sequence(1, len-n+1), i -> substring(s, i, n))``.

    Empty/short strings yield an empty array.
    """
    s = _c(text)
    count = F.greatest(F.length(s) - F.lit(n - 1), F.lit(0))
    return F.when(count > 0, F.expr(
        f"transform(sequence(1, greatest(length({_sql(s)}) - {n - 1}, 0)), i -> substring({_sql(s)}, i, {n}))"
    )).otherwise(F.array().cast("array<string>"))


def _sql(col: Column) -> str:
    # Column -> SQL fragment for use inside F.expr. Only safe for
    # simple column references, which is how ngrams() is used.
    return col._jc.toString()


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars.  DuckDB:
    ``len(regexp_extract_all(text, '[[:punct:]]')) / len(text)`` — we
    use an explicit class for cross-engine stability."""
    s = _c(text)
    return F.regexp_count(s, F.lit(r"[.,;:!?'\"()\[\]{}-]")) / F.greatest(F.length(s), F.lit(1))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is")) -> Column:
    """Fraction of tokens that are (English) stopwords — a classic
    quality-signal feature."""
    toks = F.split(F.lower(F.trim(_c(text))), r"\s+")
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in stopwords])))
    # array_intersect dedups; count hits via filter instead for a true ratio
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score: length-normalized, penalizes
    extreme punctuation density, rewards stopword presence (a cheap
    fluency proxy).  Deterministic and SQL-expressible."""
    s = _c(text)
    length_term = F.least(F.length(s) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(s) * 4.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(s) * 5.0, F.lit(1.0))
    return F.round((length_term + punct_term + stop_term) / 3.0, 6)


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text.  Identical in DuckDB:
    ``md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))``."""
    norm = F.lower(F.regexp_replace(F.trim(_c(text)), r"\s+", " "))
    return F.md5(norm)
