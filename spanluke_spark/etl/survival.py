"""Kaplan-Meier survival estimation (Kaplan & Meier 1958) over page /
URL lifetimes with RIGHT-CENSORING — how long does a page stay alive,
per host cohort, when the crawl stopped watching some pages before they
died? Recrawl scheduling (etl/recrawl.py) needs exactly this curve, and
naive averages are wrong the moment censoring exists (a page alive at
the last crawl is not a death at that age — dropping or counting it
both bias the estimate; the product-limit estimator is the fix).

S(t) = prod over event times t_i <= t of (1 - d_i / n_i), with d_i the
deaths at t_i and n_i the number still at risk (duration >= t_i).
Relational lowering: one (cohort, t) aggregate for deaths/censored, the
risk set as a DESCENDING cumulative sum over t (everything with
duration >= t), and the running product as exp of a cumulative log sum
— with the d_i = n_i collapse handled by an explicit zero branch,
because Spark's ln(0) is NULL while IEEE says -inf (engine-portability
pinned by the oracle). Two stacked windows over one cohort
partitioning: a single shuffle after the count aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kaplan_meier", "log_rank", "nelson_aalen", "aalen_johansen", "c_index", "rmst"]


def kaplan_meier(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    cohort_col: str | None = None,
) -> DataFrame:
    """df(duration, event 1/0[, cohort]) -> one row per observed
    duration per cohort: (cohort?, t, n_risk, deaths, censored,
    survival). Censor-only times carry the unchanged survival (factor
    1); survival hits exactly 0 when the last risk set dies whole."""
    cohort = [cohort_col] if cohort_col else []
    agg = (
        df.groupBy(*cohort, F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.col(event_col).cast("long")).alias("deaths"),
            F.sum(
                (F.lit(1) - F.col(event_col).cast("long"))
            ).alias("censored"),
        )
    )
    part = cohort if cohort else [F.lit(1)]
    w_desc = (
        Window.partitionBy(*part)
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_asc = (
        Window.partitionBy(*part)
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_risk = F.sum(F.col("deaths") + F.col("censored")).over(w_desc)
    with_n = agg.withColumn("n_risk", n_risk).withColumn(
        "_f", F.lit(1.0) - F.col("deaths") / F.col("n_risk")
    )
    survival = F.when(F.min("_f").over(w_asc) <= F.lit(0.0), F.lit(0.0)).otherwise(
        F.exp(
            F.sum(
                F.when(F.col("_f") > 0, F.log(F.col("_f")))
            ).over(w_asc)
        )
    )
    return with_n.select(
        *cohort,
        "t",
        "n_risk",
        "deaths",
        "censored",
        F.round(survival, 6).alias("survival"),
    )


def log_rank(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_col: str = "grp",
    crit_milli: int = 3841,
) -> DataFrame:
    """Two-group log-rank test (Mantel 1966; Peto & Peto 1972) — do
    two cohorts share a survival curve? The inferential companion to
    ``kaplan_meier``: the KM lane draws the curves, this lane says
    whether the gap is real. ``df(duration, event 1/0, grp 0/1)`` ->
    ONE row (n_times, oe_sum_milli, var_sum_micro, chi2_milli, sig).

    Exactness discipline: at each death time the observed-minus-
    expected increment and its hypergeometric variance are quantized
    ONCE —

      oe_milli = sign-split (d1*nj - d*n1j) * 1000 div nj
      v_micro  = d*n1j*(nj-n1j)*(nj-d) * 10^6 div (nj^2*(nj-1))

    — then summed exactly; because oe is milli (10^3) and v is micro
    (10^6), the units cancel so that

      chi2_milli = S*S * 1000 div V

    is one integer division (S = sum oe_milli, V = sum v_micro).
    Significance is the integer gate chi2_milli >= crit_milli against
    the caller-supplied published chi-squared df=1 critical value
    (3841 = the CMH lane's 3.841). A time with nj = 1 has zero
    variance (v = 0); V = 0 overall surfaces NULL. Overflow: the v
    numerator is <= nj^4/16 * 10^6, safe to risk sets ~5*10^3.

    Relational shape: one (t, grp-folded) aggregate, ONE descending
    cumulative window building both risk sets (suffix sums), one
    final aggregate."""
    t = df.select(
        F.col(duration_col).alias("t"),
        F.col(event_col).cast("long").alias("event"),
        F.col(group_col).cast("long").alias("g"),
    )
    per = t.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("arr"),
        F.sum("g").alias("arr1"),
        F.sum("event").alias("d"),
        F.sum(F.col("event") * F.col("g")).alias("d1"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per.select(
        "t",
        "d",
        "d1",
        F.sum("arr").over(w).alias("nj"),
        F.sum("arr1").over(w).alias("n1j"),
    ).where(F.col("d") >= 1)
    oe_num = F.col("d1") * F.col("nj") - F.col("d") * F.col("n1j")
    oe_mag = F.expr("abs(d1 * nj - d * n1j) * 1000 div nj")
    cells = risk.select(
        F.when(oe_num < 0, -oe_mag).otherwise(oe_mag).alias("oe_milli"),
        F.when(
            F.col("nj") > 1,
            F.expr(
                "d * n1j * (nj - n1j) * (nj - d) * 1000000"
                " div (nj * nj * (nj - 1))"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("v_micro"),
    )
    agg = cells.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("oe_milli").alias("oe_sum_milli"),
        F.sum("v_micro").alias("var_sum_micro"),
    )
    chi2 = F.when(
        F.col("var_sum_micro") > 0,
        F.expr("oe_sum_milli * oe_sum_milli * 1000 div var_sum_micro"),
    )
    return agg.select(
        "n_times",
        "oe_sum_milli",
        "var_sum_micro",
        chi2.alias("chi2_milli"),
    ).select("*", (F.col("chi2_milli") >= F.lit(crit_milli)).alias("sig"))


def nelson_aalen(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator (Nelson 1972; Aalen
    1978) — the INTEGRAL companion to ``kaplan_meier``: H(t) =
    sum over death times t_i <= t of d_i/n_i. Where KM multiplies
    survival factors (forcing the exp-of-log-sum lowering above), the
    hazard ADDS rationals — so the once-quantized cell discipline
    applies directly: each death time contributes

      h_step_ppm = d_i * 10^6 div n_i
      v_step_ppb = d_i * (n_i - d_i) * 10^9 div (n_i^3)

    (the ppb variance cell is the Klein survival-analysis form
    d(n-d)/n^3), and H / Var(H) are their exact cumulative sums over
    one ascending window. Censor-only times shrink later risk sets
    but emit no row (d = 0) — pinned by pytest against a censoring-
    free replay. exp(-H) >= S_KM (Breslow >= product-limit, since
    exp(-x) >= 1-x) is float-gated per step.

    df(duration, event 1/0) -> one row per DEATH time: (t, n_risk,
    deaths, h_step_ppm, h_ppm, var_ppb). Distributed shape: one
    (t) aggregate, one descending suffix-sum window for the risk set,
    one ascending cumulative window — exactly the kaplan_meier plan
    with the log-product replaced by integer sums."""
    t = df.select(
        F.col(duration_col).alias("t"),
        F.col(event_col).cast("long").alias("event"),
    )
    per = t.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("arr"),
        F.sum("event").alias("d"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per.select(
        "t", "d", F.sum("arr").over(w_desc).alias("n_risk")
    ).where(F.col("d") >= 1)
    cells = risk.select(
        "t",
        "n_risk",
        F.col("d").alias("deaths"),
        F.expr("d * 1000000 div n_risk").alias("h_step_ppm"),
        F.expr(
            "d * (n_risk - d) * 1000000000"
            " div (n_risk * n_risk * n_risk)"
        ).alias("v_step_ppb"),
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return cells.select(
        "t",
        "n_risk",
        "deaths",
        "h_step_ppm",
        F.sum("h_step_ppm").over(w_asc).alias("h_ppm"),
        F.sum("v_step_ppb").over(w_asc).alias("var_ppb"),
    )


def aalen_johansen(
    df: DataFrame,
    duration_col: str = "duration",
    cause_col: str = "cause",
) -> DataFrame:
    """Aalen-Johansen cumulative-incidence estimator (Aalen &
    Johansen 1978) for TWO competing risks — when a page can die two
    ways (content removed vs host gone), 1 - KM per cause OVERSTATES
    both incidences because it treats the rival cause as censoring;
    the AJ estimator is the correct decomposition:

      CIF_k(t) = sum over t_i <= t of S(t_i-) * d_k,i / n_i

    with S(t-) the ALL-cause KM survival strictly before t_i. Lowering
    (the kaplan_meier plan + one exclusive window): one (t) aggregate
    for (d1, d2, censored), the descending suffix-sum risk set, S(t-)
    as exp-of-log-sum over the EXCLUSIVE ascending window (rows
    unbounded preceding to -1) with the same explicit zero branch the
    KM lane pins (Spark ln(0) = NULL vs IEEE -inf), and each CIF as
    one inclusive cumulative sum of its increments.

    Identities pytest-pinned: with NO censoring,
    cif1 + cif2 + survival == 1 at every time; with cause 2 empty,
    cif1 == 1 - survival exactly; both CIFs are monotone
    nondecreasing and censor-only times leave them unchanged.

    df(duration, cause 0=censored | 1 | 2) -> one row per observed
    duration: (t, n_risk, d1, d2, censored, survival, cif1, cif2),
    floats rounded to 1e-6 (the kaplan_meier convention)."""
    rows = df.select(
        F.col(duration_col).alias("t"),
        F.col(cause_col).cast("long").alias("cause"),
    )
    per = rows.groupBy("t").agg(
        F.sum((F.col("cause") == 1).cast("long")).alias("d1"),
        F.sum((F.col("cause") == 2).cast("long")).alias("d2"),
        F.sum((F.col("cause") == 0).cast("long")).alias("censored"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    n_risk = F.sum(
        F.col("d1") + F.col("d2") + F.col("censored")
    ).over(w_desc)
    with_n = per.withColumn("n_risk", n_risk).withColumn(
        "_f",
        F.lit(1.0) - (F.col("d1") + F.col("d2")) / F.col("n_risk"),
    )
    s_prev = F.when(
        F.coalesce(F.min("_f").over(w_prev), F.lit(1.0)) <= F.lit(0.0),
        F.lit(0.0),
    ).otherwise(
        F.exp(
            F.coalesce(
                F.sum(
                    F.when(F.col("_f") > 0, F.log(F.col("_f")))
                ).over(w_prev),
                F.lit(0.0),
            )
        )
    )
    stepped = with_n.withColumn("_sprev", s_prev)
    survival = F.when(
        F.min("_f").over(w_asc) <= F.lit(0.0), F.lit(0.0)
    ).otherwise(
        F.exp(
            F.sum(
                F.when(F.col("_f") > 0, F.log(F.col("_f")))
            ).over(w_asc)
        )
    )
    cif = lambda d: F.sum(
        F.col("_sprev") * F.col(d) / F.col("n_risk")
    ).over(w_asc)
    return stepped.select(
        "t",
        "n_risk",
        "d1",
        "d2",
        "censored",
        F.round(survival, 6).alias("survival"),
        F.round(cif("d1"), 6).alias("cif1"),
        F.round(cif("d2"), 6).alias("cif2"),
    )


def c_index(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    risk_col: str = "risk",
) -> DataFrame:
    """Harrell's concordance index (Harrell et al. 1982) — does a
    risk score ORDER the lifetimes correctly under right-censoring?
    The survival-aware AUC (q296): censored pairs that cannot be
    ordered are excluded by the standard permissibility rules, not
    guessed.

    Permissible pairs (i, j), exact integer counting (the q266
    bounded pair-join contract — scores/durations are per-cohort
    slices):
      - t_i < t_j with event_i = 1 (i's death observed first), or
      - t_i == t_j with event_i = 1 and event_j = 0 (the censored
        one provably outlived the death).
    Concordant iff risk_i > risk_j (higher risk should die first);
    tied risks score half:

      c_ppm = (2 * concordant + risk_ties) * 10^6
              div (2 * permissible)        NULL when permissible == 0

    Exact lanes pytest-pinned: risk == -duration with no censoring
    gives EXACTLY 10^6; a constant risk gives EXACTLY 500000 (every
    permissible pair is a risk tie); reversing the score maps c ->
    1e6 - c up to the tie term.

    df(duration, event 1/0, risk int) -> ONE row (n, permissible,
    concordant, risk_ties, c_ppm)."""
    s = df.select(
        F.col(duration_col).cast("long").alias("t"),
        F.col(event_col).cast("long").alias("e"),
        F.col(risk_col).cast("long").alias("r"),
    ).localCheckpoint(eager=True)
    a = s.select(
        F.col("t").alias("ti"), F.col("e").alias("ei"),
        F.col("r").alias("ri"),
    )
    b = s.select(
        F.col("t").alias("tj"), F.col("e").alias("ej"),
        F.col("r").alias("rj"),
    )
    perm = (
        (F.col("ti") < F.col("tj")) & (F.col("ei") == 1)
    ) | (
        (F.col("ti") == F.col("tj"))
        & (F.col("ei") == 1)
        & (F.col("ej") == 0)
    )
    pairs = a.crossJoin(b).where(perm)
    agg = pairs.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("permissible"),
        F.sum((F.col("ri") > F.col("rj")).cast("long")).alias(
            "concordant"
        ),
        F.sum((F.col("ri") == F.col("rj")).cast("long")).alias(
            "risk_ties"
        ),
    )
    n_row = s.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n"))
    base = n_row.crossJoin(F.broadcast(agg))
    return base.select(
        "n",
        F.coalesce(F.col("permissible"), F.lit(0)).alias(
            "permissible"
        ),
        F.coalesce(F.col("concordant"), F.lit(0)).alias("concordant"),
        F.coalesce(F.col("risk_ties"), F.lit(0)).alias("risk_ties"),
        F.when(
            F.col("permissible") > 0,
            F.expr(
                "(2 * concordant + risk_ties) * 1000000"
                " div (2 * permissible)"
            ),
        ).alias("c_ppm"),
    )


def rmst(
    df: DataFrame,
    tau: int,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Restricted mean survival time (Royston & Parmar 2013): the
    area under the Kaplan-Meier curve up to the horizon tau — "how
    many crawl days does a page live, on average, within the first
    tau days?" — the one-number survival summary that stays defined
    under heavy censoring where the plain mean does not. Composes
    the ``kaplan_meier`` float lane (stated): S is a step function,
    so RMST = sum over steps of S(t_i) * (min(t_{i+1}, tau) - t_i)
    plus the leading 1.0 * min(t_1, tau) segment, rounded 1e-6.

    Closed forms pytest-pinned: no deaths -> RMST == tau exactly;
    everyone dies at t1 -> RMST == min(t1, tau); RMST is monotone
    nondecreasing in tau and bounded by tau.

    df(duration, event) -> ONE row (tau, n, rmst)."""
    if tau <= 0:
        raise ValueError("tau must be > 0")
    km = kaplan_meier(df, duration_col, event_col)
    w = Window.orderBy("t")
    steps = km.select(
        "t",
        "survival",
        F.lead("t").over(w).alias("t_next"),
        F.row_number().over(w).alias("i"),
    )
    seg = steps.select(
        # leading segment at S = 1 up to the first observed time
        F.when(
            F.col("i") == 1,
            F.least(F.col("t"), F.lit(tau)).cast("double"),
        )
        .otherwise(0.0)
        .alias("lead_seg"),
        (
            F.col("survival")
            * F.greatest(
                F.least(
                    F.coalesce(F.col("t_next"), F.lit(tau)),
                    F.lit(tau),
                )
                - F.least(F.col("t"), F.lit(tau)),
                F.lit(0),
            )
        ).alias("seg"),
    )
    n_row = df.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = seg.groupBy().agg(
        (F.sum("lead_seg") + F.sum("seg")).alias("_r")
    )
    return n_row.crossJoin(F.broadcast(agg)).select(
        F.lit(tau).cast("long").alias("tau"),
        "n",
        F.round("_r", 6).alias("rmst"),
    )
