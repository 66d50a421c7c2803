"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

Everything here is expressed JVM-side (pyspark.sql.functions) where possible —
at 10^12 rows these run inside whole-stage codegen with zero Python — with the
fingerprint (hash-based) as the one Arrow-kernel exception.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles (top function words). Deterministic,
# embedded — the n-gram-profile analogue for a no-network environment.
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "los", "que"],
}


def occurrences(text: Column, phrase: str) -> Column:
    """# of occurrences of ``phrase`` via length arithmetic — pure codegen."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(phrase), F.lit(""))))
        / len(phrase)
    ).cast("long")


def token_count(text: Column) -> Column:
    """Whitespace token count, JVM-side. Matches Python ``len(t.split())``
    for single-space-normalized text (the extractor output guarantees this)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def stopword_score(text: Column, lang: str) -> Column:
    """Stopword hits per language profile, padded-occurrence counting."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    score = F.lit(0).cast("long")
    for w in LANG_PROFILES[lang]:
        score = score + occurrences(padded, f" {w} ")
    return score


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: per-language stopword score + argmax guess.
    Deterministic tie-break: higher score wins, then lexicographic language."""
    out = df
    for lang in sorted(LANG_PROFILES):
        out = out.withColumn(f"score_{lang}", stopword_score(F.col(text_col), lang))
    # argmax via greatest + chained when (stable, SQL-expressible)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_PROFILES)])
    guess = F.lit(None).cast("string")
    for lang in sorted(LANG_PROFILES, reverse=True):
        guess = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(guess)
    return out.withColumn("lang_guess", guess)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality signals: length, token count, mean word length, punctuation
    ratio, uppercase ratio — all codegen expressions."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    safe = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    return df.select(
        "*",
        n_chars.cast("long").alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        F.when(n_tokens > 0, (n_chars - n_tokens + 1).cast("double") / n_tokens)
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        (n_punct.cast("double") / safe).alias("punct_ratio"),
        (n_upper.cast("double") / safe).alias("upper_ratio"),
    )


def filter_quality(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int | None = None,
    max_punct_ratio: float = 0.2,
    max_upper_ratio: float = 0.5,
    langs: list[str] | None = None,
    lang_col: str = "lang",
) -> DataFrame:
    """One-call curation filter: the standard pre-training document gate
    (length window, punctuation/uppercase caps, language allowlist) as pure
    codegen predicates — Catalyst pushes the lang allowlist to the scan and
    fuses the rest into one WholeStageCodegen filter, so the gate costs one
    pass and prunes before any shuffle."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    safe = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    cond = (n_tokens >= min_tokens) & (n_punct / safe <= max_punct_ratio) & (
        n_upper / safe <= max_upper_ratio
    )
    if max_tokens is not None:
        cond = cond & (n_tokens <= max_tokens)
    if langs:
        cond = F.col(lang_col).isin(langs) & cond
    return df.filter(cond)


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


def bpe_ish_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting with a BPE-ish regex (letters runs / short digit groups /
    single punctuation) — the cheap JVM-side ESTIMATOR for quality filters
    and budget planning (pure codegen, no Python stage). For exact counts
    under a frozen merges table use ``etl.bpe.bpe_token_count`` (real
    byte-level BPE, one Arrow stage) — that is what q37 measures."""
    return df.withColumn(
        "n_bpe_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)).cast("long"),
    )


def _top_run_count(arr: Column) -> Column:
    """Max multiplicity of any element in ``arr``: sort, then a single
    aggregate() pass tracking (prev, run, best). Higher-order function —
    runs per-row inside the JVM with zero shuffle and zero Python."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(F.sort_array(arr), init, step, lambda acc: acc["best"])


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1: repetitious
    documents are low-quality training data): word count, distinct-word
    count, top-word multiplicity, bigram count, top-bigram multiplicity,
    plus derived ratios.

    Scale design: everything is a per-row array expression (split /
    array_distinct / zip_with / aggregate) — at 10^12 docs this is a single
    scan-project with NO shuffle, unlike the naive explode->groupBy(doc,word)
    formulation which shuffles every token.
    """
    t = F.col(text_col)
    words = F.split(t, " ")
    n = F.size(words)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(words, 1, n - 1),
            F.slice(words, F.lit(2), n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bg = F.size(bigrams)
    top_w = _top_run_count(words)
    top_bg = F.when(n_bg > 0, _top_run_count(bigrams)).otherwise(F.lit(0).cast("long"))
    return df.select(
        "*",
        n.cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct_words"),
        top_w.alias("top_word_count"),
        n_bg.cast("long").alias("n_bigrams"),
        top_bg.alias("top_bigram_count"),
        F.round(top_w.cast("double") / n, 6).alias("top_word_frac"),
        F.round(
            F.when(n_bg > 0, top_bg.cast("double") / n_bg).otherwise(F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
    )


def fingerprint(df: DataFrame, id_cols: list[str], text_col: str = "text") -> DataFrame:
    """Document fingerprint: polynomial rolling hash over whitespace tokens
    (order-sensitive, content-defined). Arrow kernel; worker-stable."""
    ids = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols)
    schema = f"{ids}, fingerprint long"
    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        def h64(s: str) -> int:
            return struct.unpack(
                "<Q", hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
            )[0]

        for pdf in batches:
            fps = []
            for text in pdf[text_col]:
                acc = 0
                for tok in (text or "").split():
                    acc = (acc * BASE + h64(tok)) % MOD
                fps.append(acc)
            yield pd.DataFrame({**{c: pdf[c] for c in id_cols}, "fingerprint": fps})

    return df.select(*id_cols, text_col).mapInPandas(_fp, schema)


def readability_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per document — the
    classic readability gate a quality-filtering pipeline runs next to
    stopword/length heuristics (C4 and FineWeb both cut on sentence-shape
    signals; Flesch 1948 / Kincaid 1975 are the canonical formulas).

    Syllables use the standard vowel-group approximation (runs of
    [aeiouy] count one syllable; a trailing silent 'e' is subtracted;
    every word counts at least one) — deterministic, documented, and
    replayable in SQL. Sentences = runs ending in [.!?] (min 1). All
    pure codegen: two regexp counts + one HOF aggregate, no shuffle.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z]+"), lambda t: t != F.lit("")
    )
    n_words = F.greatest(F.size(toks), F.lit(1))

    def word_syllables(w: Column) -> Column:
        groups = F.size(
            F.filter(F.split(w, "[^aeiouy]+"), lambda g: g != F.lit(""))
        )
        silent_e = (
            w.rlike("[^aeiouy]e$") & (groups > 1)
        ).cast("int")
        return F.greatest(groups - silent_e, F.lit(1))

    n_syll = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + word_syllables(w)
    )
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), 0)),
        F.lit(1),
    )
    wps = n_words.cast("double") / n_sent
    spw = n_syll.cast("double") / n_words
    return df.withColumns(
        {
            "n_words": n_words,
            "n_sentences": n_sent,
            "n_syllables": n_syll,
            "flesch_ease": F.round(206.835 - 1.015 * wps - 84.6 * spw, 6),
            "fk_grade": F.round(0.39 * wps + 11.8 * spw - 15.59, 6),
        }
    )
