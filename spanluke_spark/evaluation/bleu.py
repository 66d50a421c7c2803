"""Corpus-level BLEU (Papineni, Roukos, Ward & Zhu, ACL 2002) — the
n-gram overlap score for any "regenerate the text" lane (extraction
round-trips, OCR/ASR-style recovery, summarization-ish rewrites): the
engine's eval family has label metrics (strict-span F1, nervaluate),
ranking metrics (nDCG, MAP) and agreement (kappa, alpha); BLEU is the
string-overlap member.

Corpus BLEU, single reference:
  p_n = sum_d clipped n-gram matches / sum_d candidate n-grams
  BP  = min(1, exp(1 - r/c)) with c = sum cand len, r = sum ref len
  ln BLEU = min(0, 1 - r/c) + (1/4) sum_n ln p_n

Everything is carried exactly: clipped matches and totals are integer
counts; each ln p_n is quantized ONCE to round(ln*10^6); the brevity
term is the exact rational -(r-c)*10^6 div c (sign-split trunc); the
1/4 mean divides the summed magnitudes (each term <= 0) — so ln BLEU
is an integer ppm replayable bit-identically in SQL. A zero match at
any order makes BLEU 0: ln_bleu_ppm is NULL and zero_match = true.

Distributed shape: n-grams from each side via a native slice/transform
HOF (no Python), counted per (doc, gram) — combinable — clipped by a
per-doc equi-join on the gram, then ONE corpus-level agg per (group,
n). No pair joins, no driver loops; groups scale out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bleu_corpus"]


def _toks(col: str) -> F.Column:
    return F.filter(F.split(F.col(col), " "), lambda t: t != "")


def _grams(arr_col: str, n: int) -> F.Column:
    # guard n > len: sequence(0, negative) would generate DESCENDING
    a = F.col(arr_col)
    return F.when(F.size(a) >= n, F.transform(
        F.sequence(F.lit(0), F.size(a) - n),
        lambda i: F.concat_ws(" ", F.slice(a, i + 1, n)),
    )).otherwise(F.array().cast("array<string>"))


def bleu_corpus(
    df: DataFrame,
    group_col: str = "grp",
    id_col: str = "id",
    cand_col: str = "cand",
    ref_col: str = "ref",
    max_n: int = 4,
) -> DataFrame:
    """(group, doc id, cand text, ref text) rows -> per (group, n in
    1..max_n): (grp, n, match_cnt, total_cnt, ln_prec_ppm, c_len,
    r_len, bp_ln_ppm, ln_bleu_ppm, zero_match). Clipping is per-doc
    (id_col keys the cand<->ref join). ln_bleu_ppm is shared across
    the group's rows (corpus-level), NULL when any order has zero
    matches."""
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("_d"),
        _toks(cand_col).alias("ca"),
        _toks(ref_col).alias("ra"),
    )
    lens = base.groupBy("grp").agg(
        F.sum(F.size("ca")).cast("long").alias("c_len"),
        F.sum(F.size("ra")).cast("long").alias("r_len"),
    )
    per_n = None
    for n in range(1, max_n + 1):
        cg = base.select(
            "grp", "_d", F.explode(_grams("ca", n)).alias("gram")
        ).groupBy("grp", "_d", "gram").agg(F.count(F.lit(1)).alias("cc"))
        rg = base.select(
            "grp", "_d", F.explode(_grams("ra", n)).alias("gram")
        ).groupBy("grp", "_d", "gram").agg(F.count(F.lit(1)).alias("rc"))
        j = cg.join(rg, ["grp", "_d", "gram"], "left").select(
            "grp",
            "cc",
            F.least(F.col("cc"), F.coalesce(F.col("rc"), F.lit(0))).alias(
                "clip"
            ),
        )
        agg = j.groupBy("grp").agg(
            F.sum("clip").cast("long").alias("match_cnt"),
            F.sum("cc").cast("long").alias("total_cnt"),
        ).withColumn("n", F.lit(n))
        per_n = agg if per_n is None else per_n.unionByName(agg)
    per_n = per_n.withColumn(
        "ln_prec_ppm",
        F.when(
            (F.col("match_cnt") > 0) & (F.col("total_cnt") > 0),
            F.round(
                F.log(F.col("match_cnt") / F.col("total_cnt")) * 1_000_000
            ).cast("long"),
        ),
    )
    tot = per_n.groupBy("grp").agg(
        F.sum("ln_prec_ppm").alias("_sum_ln"),
        F.min(F.col("match_cnt")).alias("_min_match"),
    )
    out = per_n.join(tot, "grp").join(lens, "grp")
    # brevity: min(0, 1 - r/c) = -(r - c)/c when r > c, exact trunc-ppm
    bp = F.when(
        F.col("r_len") <= F.col("c_len"), F.lit(0).cast("long")
    ).otherwise(-F.expr("(r_len - c_len) * 1000000 div c_len"))
    out = out.withColumn("bp_ln_ppm", bp)
    # each ln p_n <= 0: mean of magnitudes, trunc, re-negate
    mean_ln = -F.expr(f"(-_sum_ln) div {max_n}")
    return out.select(
        "grp",
        "n",
        "match_cnt",
        "total_cnt",
        "ln_prec_ppm",
        "c_len",
        "r_len",
        "bp_ln_ppm",
        F.when(
            F.col("_min_match") > 0,
            (F.col("bp_ln_ppm") + mean_ln).cast("long"),
        ).alias("ln_bleu_ppm"),
        (F.col("_min_match") == 0).alias("zero_match"),
    )
