"""Corpus dispersion — Gries' DP, "deviation of proportions" (Gries
2008) — is a term spread evenly across corpus parts (hosts, shards,
crawls) or piled into one? Raw frequency can't tell a ubiquitous
function word from a single-host artifact with the same count; DP is
the standard corpus-linguistics answer and the per-TOKEN analogue of
the Hoover index (q344):

  DP(t) = (1/2) * sum_parts | f_{t,i}/F_t - N_i/N |

(f = token count in part i, F = token total, N_i = part size,
N = corpus size). DP = 0 means the token follows the part sizes
exactly; DP -> 1 means one-part concentration.

Exactness discipline — fully exact, no logs: cross-multiplied to

  dp_num = sum_i | f_{t,i}*N - N_i*F_t |        (absent parts
                                                 contribute N_i*F_t)
  dp_ppm = dp_num * 10^6 div (2 * F_t * N)

dp_num <= 2*F_t*N by the triangle inequality, so dp_ppm <= 10^6 and
the product stays inside the long bound for corpora to ~10^6 tokens
per evaluation slice. A token spread exactly with the part sizes
gives dp_num == 0 (gated); a single-part token gives exactly
(N - N_i)/N.

Distributed shape: one (part) size aggregate (bounded, broadcast),
one (token, part) count aggregate, a token-grid cross join against
the broadcast part table so ABSENT parts surface, one (token)
aggregate. Corpus-linear; the part axis is configuration-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dispersion_dp"]


def dispersion_dp(
    tokens: DataFrame,
    min_count: int = 1,
    part_col: str = "part",
    token_col: str = "token",
) -> DataFrame:
    """(part, token) one row per occurrence -> per token
    (token, f_total, n_parts, dp_num, dp_ppm)."""
    t = tokens.select(
        F.col(part_col).alias("part"), F.col(token_col).alias("token")
    )
    parts = t.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("ni")
    )
    tot = parts.groupBy().agg(
        F.sum("ni").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    cnt = t.groupBy("token", "part").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    ft = cnt.groupBy("token").agg(F.sum("f").alias("f_total")).where(
        F.col("f_total") >= min_count
    )
    grid = ft.crossJoin(F.broadcast(parts)).join(
        cnt, ["token", "part"], "left"
    )
    cells = grid.crossJoin(F.broadcast(tot)).select(
        "token",
        "f_total",
        "n_parts",
        "n",
        F.abs(
            F.coalesce(F.col("f"), F.lit(0)) * F.col("n")
            - F.col("ni") * F.col("f_total")
        ).alias("dev"),
    )
    agg = cells.groupBy("token").agg(
        F.max("f_total").alias("f_total"),
        F.max("n_parts").alias("n_parts"),
        F.max("n").alias("n"),
        F.sum("dev").alias("dp_num"),
    )
    return agg.select(
        "token",
        "f_total",
        "n_parts",
        "dp_num",
        F.expr("dp_num * 1000000 div (2 * f_total * n)").alias("dp_ppm"),
    )
