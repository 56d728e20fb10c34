"""Text-analysis column functions for the training-data pipeline.

All pure Spark column expressions (JVM-side, whole-stage codegen) —
no UDFs anywhere in this module.  Each has a DuckDB-expressible
equivalent used as its correctness oracle (__spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]

# tiny per-language marker vocabularies for the n-gram/marker
# language-ID heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
    "es": ["el", "que", "los"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text; empty text → []."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish sub-word proxy: runs of letters, runs of digits, and
    single punctuation marks each count as one token."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles as an array<string> — computed entirely with
    array expressions (no explode, no shuffle)."""
    toks = tokens(text)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        )
    )


def char_len(text: Column) -> Column:
    return F.length(text)


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters."""
    return F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / F.greatest(
        F.length(text), F.lit(1)
    )


def digit_ratio(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^0-9]", "")) / F.greatest(
        F.length(text), F.lit(1)
    )


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords."""
    toks = tokens(F.lower(text))
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards alphabetic
    content and mid-range length, penalizes very short docs and
    stopword-free (unnatural) text."""
    length_term = F.least(char_len(text) / F.lit(500.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * alpha_ratio(text)
        + F.lit(0.3) * length_term
        + F.lit(0.3) * F.least(stopword_ratio(text) * 5, F.lit(1.0)),
        4,
    )


def lang_id(text: Column) -> Column:
    """Marker-word language ID: count per-language marker hits and
    take the argmax (ties → lexicographically first language, making
    the result deterministic and oracle-comparable)."""
    lowered = F.lower(text)
    scored = None
    for lang in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[lang]
        pat = r"\b(" + "|".join(markers) + r")\b"
        score = F.size(F.regexp_extract_all(lowered, F.lit(pat), 0))
        entry = F.struct(score.alias("score"), F.lit(lang).alias("lang"))
        scored = F.array(entry) if scored is None else F.concat(scored, F.array(entry))
    # argmax with deterministic tie-break: sort by (-score, lang).
    best = F.array_min(
        F.transform(
            scored,
            lambda s: F.struct((-s["score"]).alias("neg"), s["lang"].alias("lang")),
        )
    )
    return best["lang"]


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over the normalized token stream
    (lowercase, punctuation stripped, whitespace collapsed) — two
    docs differing only in case/punct/spacing collide, which is the
    point (near-canonical dedup key)."""
    norm = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " ")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return F.md5(norm)


def winnowing_fingerprints(
    text: Column, k: int = 5, w: int = 4, mod: int = 2_147_483_647, base: int = 257
) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    MOSS scheme): polynomial rolling hashes of the char k-grams, then
    the minimum hash of every w-gram window, deduplicated — a compact,
    position-robust fingerprint SET whose overlap measures local
    similarity (the reference has no analogue; this is the
    training-data-pipeline fingerprinting op).

    All arithmetic is exact BIGINT mod ``mod`` (< 2^31), so DuckDB can
    replay it digit-for-digit (the oracle for ``winnowing_fp``) —
    deliberately NOT xxhash64, which only Spark has.  Pure array
    folds: zero shuffle, whole-stage codegen."""
    t = F.lower(text)
    n = F.length(t)
    m = F.greatest(n - F.lit(k) + 1, F.lit(0))  # number of k-grams
    empty = F.array().cast("array<bigint>")
    gram_hash = lambda i: F.aggregate(  # noqa: E731
        F.sequence(F.lit(0), F.lit(k - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: (acc * base + F.ascii(F.substring(t, i + j, 1))) % mod,
    )
    # NB: Spark's sequence(1, 0) DESCENDS — guard the empty cases.
    grams = F.when(m > 0, F.transform(F.sequence(F.lit(1), m), gram_hash)).otherwise(empty)
    n_windows = F.greatest(m - F.lit(w) + 1, F.lit(1))
    selected = F.when(
        m > 0,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda p: F.array_min(F.slice(grams, p, F.least(F.lit(w), m))),
        ),
    ).otherwise(empty)
    return F.array_sort(F.array_distinct(selected))
