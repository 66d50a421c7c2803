"""chrF — character n-gram F-score (Popović 2015, WMT) — the
tokenization-free MT/paraphrase eval beside word-level BLEU (q301) and
LCS-level ROUGE-L (q315): robust to morphology and tokenizer drift,
which makes it the right screen for noisy web-parallel text.

Pinned definition (sacrebleu-compatible, stated exactly):

  - whitespace is removed; n-grams run over the remaining character
    sequence, orders n = 1..6
  - per order: clipped matches m_n = sum over distinct grams of
    min(count_hyp, count_ref); P_n = m_n / H_n, R_n = m_n / R_n
    (totals, not distincts)
  - "effective order": orders where EITHER side has zero n-grams
    (text shorter than n) are skipped; P and R are arithmetic means
    over the remaining orders
  - chrF_beta = (1 + b^2) P R / (b^2 P + R) with beta = 2 (chrF2)

Exactness discipline: per-order P_n, R_n are ONCE-quantized to
trunc-ppm (exact integer clipped-match and total counts first); the
means and the F combination are then exact integer arithmetic on
those ppm values:

  p = (sum P_ppm) div eff,  r = (sum R_ppm) div eff,
  chrf_ppm = 5 p r div (4 p + r)     (0 when p + r = 0)

Distributed shape: n-gram explode -> one (pair, n, gram) groupBy per
side -> inner join on matching grams -> per-pair agg. All counts
combine map-side; the join key (pair, n, gram) is high-cardinality
and uniform — no skew. Pairs with an empty side (no chars at all)
are dropped, matching the undefined-score contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chrf"]

MAX_ORDER = 6
BETA2 = 4  # beta = 2


def chrf(
    pairs: DataFrame,
    pair_col: str = "pair_id",
    hyp_col: str = "hyp",
    ref_col: str = "ref",
) -> DataFrame:
    """(pair_id, hyp, ref) -> (pair_id, h_chars, r_chars, eff, p_ppm,
    r_ppm, chrf_ppm)."""
    base = pairs.select(
        F.col(pair_col).alias("pair_id"),
        F.regexp_replace(F.col(hyp_col), r"\s+", "").alias("h"),
        F.regexp_replace(F.col(ref_col), r"\s+", "").alias("r"),
    ).where((F.length("h") > 0) & (F.length("r") > 0))

    def side_counts(col: str, out: str) -> DataFrame:
        g = base.select(
            "pair_id",
            F.col(col).alias("s"),
            F.explode(
                F.sequence(
                    F.lit(1), F.least(F.lit(MAX_ORDER), F.length(col))
                )
            ).alias("n"),
        )
        grams = g.select(
            "pair_id",
            "n",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("s") - F.col("n") + 1),
                    lambda i: F.col("s").substr(i, F.col("n")),
                )
            ).alias("gram"),
        )
        return grams.groupBy("pair_id", "n", "gram").agg(
            F.count(F.lit(1)).cast("long").alias(out)
        )

    hc = side_counts("h", "ch")
    rc = side_counts("r", "cr")
    # matches per (pair, n): join on gram; totals per (pair, n, side)
    m = (
        hc.join(rc, ["pair_id", "n", "gram"])
        .groupBy("pair_id", "n")
        .agg(F.sum(F.least("ch", "cr")).cast("long").alias("m"))
    )
    ht = hc.groupBy("pair_id", "n").agg(F.sum("ch").cast("long").alias("ht"))
    rt = rc.groupBy("pair_id", "n").agg(F.sum("cr").cast("long").alias("rt"))
    # effective orders = those present on BOTH sides (inner join)
    per = (
        ht.join(rt, ["pair_id", "n"])
        .join(m, ["pair_id", "n"], "left")
        .select(
            "pair_id",
            "n",
            F.coalesce("m", F.lit(0)).alias("m"),
            "ht",
            "rt",
        )
        .withColumn("p_ppm_n", F.expr("m * 1000000 div ht"))
        .withColumn("r_ppm_n", F.expr("m * 1000000 div rt"))
    )
    agg = per.groupBy("pair_id").agg(
        F.count(F.lit(1)).cast("long").alias("eff"),
        F.sum("p_ppm_n").alias("sp"),
        F.sum("r_ppm_n").alias("sr"),
    )
    lens = base.select(
        "pair_id",
        F.length("h").cast("long").alias("h_chars"),
        F.length("r").cast("long").alias("r_chars"),
    )
    return lens.join(agg, "pair_id").select(
        "pair_id",
        "h_chars",
        "r_chars",
        "eff",
        F.expr("sp div eff").alias("p_ppm"),
        F.expr("sr div eff").alias("r_ppm"),
        F.expr(
            "CASE WHEN sp div eff + sr div eff = 0 THEN 0 "
            f"ELSE (1 + {BETA2}) * (sp div eff) * (sr div eff) "
            f"div ({BETA2} * (sp div eff) + (sr div eff)) END"
        ).alias("chrf_ppm"),
    )
