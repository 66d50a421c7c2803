"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline (documents -> span mentions -> triples).
``queries()`` — one named query per implemented operator (SURVEY.md §2).
``oracle_sql()`` — matching DuckDB SQL for the correctness gate.

Column names/types are aligned pairwise: every computed column is aliased
identically in the Spark plan and the SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spanluke_spark.fixtures import (  # noqa: E402
    PIPELINE_GAZETTEER,
    TOKEN_GAZETTEER,
    TOKEN_GAZETTEER_SQL_CASE,
)
from spanluke_spark.ner.spans import enumerate_spans_relational  # noqa: E402
from spanluke_spark.pipeline import (  # noqa: E402
    extract_mentions_span,
    extract_mentions_token,
    mentions_to_triples,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# Flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """documents (sf0.001) -> span-path mention extraction -> distinct triples."""
    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    mentions = extract_mentions_span(docs, ["doc_id"], PIPELINE_GAZETTEER)
    return mentions_to_triples(mentions, subj_col="doc_id")


# ---------------------------------------------------------------------------
# Queries (Spark side)
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: multi-agg groupBy (TPC-H Q1 shape) — partial+final hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).alias("sum_disc_price"),
            F.sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q02_top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7-shape: broadcast dim joins + agg + deterministic top-k."""
    li, orders, cust = (
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


def q03_largest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-family: row_number window, deterministic tiebreaker."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    )


def q04_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 relational analog: gaps-and-islands sessionization (30-min gap) —
    the same lag->flag->running-sum->groupBy used by the mention decode."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; session TZ is UTC so the LTZ reinterpretation is exact.
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    flagged = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


def q05_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/U2: left_anti resume — orders with no lineitem shipped after cutoff."""
    orders, li = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    done = li.filter(F.col("l_shipdate") > "1998-06-01").select("l_orderkey").distinct()
    return (
        orders.join(done, orders.o_orderkey == done.l_orderkey, "left_anti")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


def q06_strict_eval_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 + F8: nervaluate-strict TP/FN/FP as set ops + epsilon F1 arithmetic
    (the 1e-9 epsilon replicates legal_ner/main.py:326-342)."""
    li = _t(spark, sf_dir, "lineitem")
    key = ["l_orderkey", "l_linenumber"]
    # (l_orderkey, l_linenumber) is not unique in the synthetic data —
    # distinct first so INTERSECT/EXCEPT set semantics are well-defined.
    # One full-outer join + one aggregate = a single pass over each side
    # (vs 3 separate intersect/except jobs rescanning the table).
    gold = li.filter(F.col("l_discount") > 0.06).select(*key).distinct().withColumn("g", F.lit(1))
    pred = li.filter(F.col("l_tax") > 0.05).select(*key).distinct().withColumn("p", F.lit(1))
    row = (
        gold.join(pred, key, "full_outer")
        .agg(
            F.count(F.when(F.col("g").isNotNull() & F.col("p").isNotNull(), 1)).alias("tp"),
            F.count(F.when(F.col("g").isNotNull() & F.col("p").isNull(), 1)).alias("fn"),
            F.count(F.when(F.col("g").isNull() & F.col("p").isNotNull(), 1)).alias("fp"),
        )
        .first()
    )
    tp, fn, fp = row.tp, row.fn, row.fp
    p = tp / (tp + fp) if (tp + fp) else 0.0
    r = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * p * r / (p + r + 1e-9)
    return spark.createDataFrame(
        [(tp, fn, fp, p, r, f1)],
        "tp long, fn long, fp long, precision double, recall double, f1 double",
    )


def q07_span_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: relational span enumeration (explode(sequence) x2) + closed-form
    span_idx, checksummed against the oracle's row_number ranking."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") % 11 + 1).cast("int").alias("num_words")
    )
    spans = enumerate_spans_relational(docs, "num_words", max_length=6)
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("span_idx").cast("long") * F.col("w_start")).alias("checksum"),
        )
        .orderBy("doc_id")
    )


def q08_phrase_occurrences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/J7-lite: gazetteer phrase occurrence counts via length arithmetic
    (JVM-side, no UDF)."""
    docs = _t(spark, sf_dir, "documents")
    phrases = ["hash join", "table scan", "sort merge"]
    out = None
    for ph in phrases:
        cnt = (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(ph), F.lit(""))))
            / len(ph)
        ).cast("long")
        one = docs.select(F.lit(ph).alias("phrase"), cnt.alias("n")).groupBy("phrase").agg(
            F.sum("n").alias("occurrences")
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("phrase")


def q09_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: corpus statistics with exact-integer-derived moments (deterministic
    across engines; numpy-std semantics = population, ddof=0)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.col("n_chars") * F.col("n_chars")).alias("sumsq_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .withColumn(
            "avg_chars", F.col("sum_chars").cast("double") / F.col("n_docs")
        )
        .withColumn(
            "var_pop_chars",
            (
                F.col("sumsq_chars").cast("double")
                - F.col("sum_chars").cast("double") * F.col("sum_chars") / F.col("n_docs")
            )
            / F.col("n_docs"),
        )
        .orderBy("lang")
    )


def q10_event_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: distribution counting + distinct users per event type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("value").alias("sum_value"),
        )
        .orderBy("event_type")
    )


def q11_token_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+W1 end-to-end: the full distributed token-classification mention
    pipeline (tokenize -> gazetteer scorer -> adjacent-merge) checked against
    an independent pure-SQL implementation of the same semantics."""
    docs = _t(spark, sf_dir, "documents")
    m = extract_mentions_token(docs, ["doc_id"], TOKEN_GAZETTEER)
    return m.select("doc_id", "start", "end", "label").orderBy("doc_id", "start")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_top_revenue_customers": q02_top_revenue_customers,
        "q03_largest_order_per_customer": q03_largest_order_per_customer,
        "q04_sessionize_events": q04_sessionize_events,
        "q05_resume_anti_join": q05_resume_anti_join,
        "q06_strict_eval_set_ops": q06_strict_eval_set_ops,
        "q07_span_enumeration": q07_span_enumeration,
        "q08_phrase_occurrences": q08_phrase_occurrences,
        "q09_corpus_stats": q09_corpus_stats,
        "q10_event_type_distribution": q10_event_type_distribution,
        "q11_token_mentions": q11_token_mentions,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(l_extendedprice) AS sum_base_price,
                   sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
                   sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q02_top_revenue_customers": """
            SELECT c_custkey, c_name,
                   sum(l_extendedprice * (1 - l_discount)) AS revenue,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 10
        """,
        "q03_largest_order_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders
            ) WHERE rn = 1
            ORDER BY o_custkey
        """,
        "q04_sessionize_events": """
            WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id, ts,
                       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS session_id
                FROM flagged
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM sess GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        "q05_resume_anti_join": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE NOT EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
            )
            ORDER BY o_orderkey
        """,
        "q06_strict_eval_set_ops": """
            WITH gold AS (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem WHERE l_discount > 0.06),
                 pred AS (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem WHERE l_tax > 0.05),
                 tp AS (SELECT count(*) AS c FROM (SELECT * FROM gold INTERSECT SELECT * FROM pred)),
                 fn AS (SELECT count(*) AS c FROM (SELECT * FROM gold EXCEPT SELECT * FROM pred)),
                 fp AS (SELECT count(*) AS c FROM (SELECT * FROM pred EXCEPT SELECT * FROM gold))
            SELECT CAST(tp.c AS BIGINT) AS tp, CAST(fn.c AS BIGINT) AS fn, CAST(fp.c AS BIGINT) AS fp,
                   CASE WHEN tp.c + fp.c = 0 THEN 0.0 ELSE CAST(tp.c AS DOUBLE) / (tp.c + fp.c) END AS precision,
                   CASE WHEN tp.c + fn.c = 0 THEN 0.0 ELSE CAST(tp.c AS DOUBLE) / (tp.c + fn.c) END AS recall,
                   2 * (CASE WHEN tp.c + fp.c = 0 THEN 0.0 ELSE CAST(tp.c AS DOUBLE) / (tp.c + fp.c) END)
                     * (CASE WHEN tp.c + fn.c = 0 THEN 0.0 ELSE CAST(tp.c AS DOUBLE) / (tp.c + fn.c) END)
                     / ((CASE WHEN tp.c + fp.c = 0 THEN 0.0 ELSE CAST(tp.c AS DOUBLE) / (tp.c + fp.c) END)
                      + (CASE WHEN tp.c + fn.c = 0 THEN 0.0 ELSE CAST(tp.c AS DOUBLE) / (tp.c + fn.c) END)
                      + 1e-9) AS f1
            FROM tp, fn, fp
        """,
        "q07_span_enumeration": """
            WITH d AS (
                SELECT doc_id, CAST(n_chars % 11 + 1 AS INT) AS num_words FROM documents
            ), starts AS (
                SELECT doc_id, num_words, UNNEST(range(0, num_words)) AS w_start FROM d
            ), spans AS (
                SELECT doc_id, num_words, w_start,
                       UNNEST(range(w_start + 1, LEAST(w_start + 6, num_words) + 1)) AS w_end
                FROM starts
            ), ranked AS (
                SELECT doc_id, w_start, w_end,
                       row_number() OVER (PARTITION BY doc_id ORDER BY w_start, w_end) - 1 AS span_idx
                FROM spans
            )
            SELECT doc_id, count(*) AS n_spans,
                   CAST(sum(span_idx * w_start) AS BIGINT) AS checksum
            FROM ranked GROUP BY doc_id ORDER BY doc_id
        """,
        "q08_phrase_occurrences": """
            SELECT phrase,
                   CAST(sum((length(text) - length(replace(text, phrase, ''))) // length(phrase)) AS BIGINT)
                   AS occurrences
            FROM documents, (SELECT UNNEST(['hash join', 'table scan', 'sort merge']) AS phrase)
            GROUP BY phrase ORDER BY phrase
        """,
        "q09_corpus_stats": """
            SELECT lang, count(*) AS n_docs,
                   sum(n_chars) AS sum_chars,
                   sum(n_chars * n_chars) AS sumsq_chars,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars,
                   CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
                   (CAST(sum(n_chars * n_chars) AS DOUBLE)
                    - CAST(sum(n_chars) AS DOUBLE) * sum(n_chars) / count(*)) / count(*)
                   AS var_pop_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "q10_event_type_distribution": """
            SELECT event_type, count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users,
                   sum(value) AS sum_value
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q11_token_mentions": f"""
            WITH toks AS (
                SELECT doc_id,
                       UNNEST(string_split(text, ' ')) AS token,
                       UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS pos
                FROM documents
            ), typed AS (
                SELECT doc_id, pos, token,
                       {TOKEN_GAZETTEER_SQL_CASE} AS pred_type,
                       CAST(sum(length(token) + 1) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS INT) AS prev_len
                FROM toks
            ), offs AS (
                SELECT doc_id, pos, pred_type,
                       COALESCE(prev_len, 0) AS start,
                       COALESCE(prev_len, 0) + length(token) AS "end"
                FROM typed
            ), flagged AS (
                SELECT *, CASE WHEN pred_type <> 'O'
                                AND (lag(pred_type) OVER w IS NULL OR lag(pred_type) OVER w <> pred_type)
                          THEN 1 ELSE 0 END AS is_new
                FROM offs
                WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            ), numbered AS (
                SELECT *, sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mention_id
                FROM flagged WHERE TRUE
            )
            SELECT doc_id, CAST(min(start) AS INT) AS start, CAST(max("end") AS INT) AS "end",
                   pred_type AS label
            FROM numbered WHERE pred_type <> 'O'
            GROUP BY doc_id, mention_id, pred_type
            ORDER BY doc_id, start
        """,
    }
