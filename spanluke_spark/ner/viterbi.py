"""HMM Viterbi decoding (Viterbi 1967; Forney 1973 presentation) as a
single native-HOF aggregate fold per sequence — the classical exact
MAP decoder for tagging pipelines, the dynamic-programming counterpart
to the greedy span decode in ``ner/decode.py`` (reference analogue:
SpanLuke's label decode, `legal_ner/inference.py` — which is greedy;
Viterbi is the exact variant a transition-aware tagger needs).

Model: S states, integer-quantized log-scores (e.g. round(K·ln p) —
quantized ONCE when the model is built, never re-derived from floats
inside the query, so the whole DP is exact integer arithmetic):

  start[s]        : score of starting in state s
  trans[p][s]     : score of moving p -> s
  emit[tok][s]    : score of state s emitting token tok (closed vocab)

DP carry per sequence (fold over the observation array, accumulator =
``struct(scores: array<long>, paths: array<string>)``):

  scores[s] = best score of any path ending in state s
  paths[s]  = that path itself, comma-joined state indices

so the backtrack pass disappears — each step extends the argmax
predecessor's stored path. Ties break to the LOWEST predecessor state
index (``array_position`` finds the first maximum), and the final
answer ties break to the lowest final state, making the decode fully
deterministic and bit-replayable.

Distributed shape: zero shuffles — one projection with a per-row fold;
the model is a handful of literal arrays/maps compiled into the plan
(a real model would broadcast; S and the vocab are model-sized, the
corpus is the only big side). Score sums are bounded by
len(obs)·max|score| — far inside long range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["viterbi_decode"]


def _lit_long_array(xs) -> Column:
    return F.array(*[F.lit(int(x)).cast("long") for x in xs])


def viterbi_decode(
    seqs: DataFrame,
    start: list[int],
    trans: list[list[int]],
    emit: dict[str, list[int]],
    seq_col: str = "seq_id",
    obs_col: str = "obs",
) -> DataFrame:
    """(seq_id, obs: array<string>) -> (seq_id, n, path, best_score).

    ``path`` is the comma-joined MAP state sequence; ``best_score`` the
    exact integer score of that path. Empty sequences are dropped (no
    path to report). All arithmetic long-exact; ties deterministic
    (lowest state index at every argmax).
    """
    n_states = len(start)
    start_c = _lit_long_array(start)
    trans_c = F.array(*[_lit_long_array(row) for row in trans])
    emit_c = F.map_from_arrays(
        F.array(*[F.lit(t) for t in emit]),
        F.array(*[_lit_long_array(v) for v in emit.values()]),
    )
    states = F.sequence(F.lit(1), F.lit(n_states))  # 1-based state slots

    out = seqs.where(F.size(F.col(obs_col)) > 0).select(
        F.col(seq_col).alias("seq_id"),
        F.col(obs_col).alias("obs"),
        start_c.alias("_start"),
        trans_c.alias("_trans"),
        emit_c.alias("_emit"),
    )

    # position 1 seeds the carry; the fold walks obs[2..n]
    init = F.struct(
        F.transform(
            states,
            lambda s: F.element_at(F.col("_start"), s)
            + F.element_at(
                F.element_at(F.col("_emit"), F.element_at(F.col("obs"), 1)), s
            ),
        ).alias("scores"),
        F.transform(states, lambda s: (s - 1).cast("string")).alias("paths"),
    )

    def step(acc: Column, tok: Column) -> Column:
        # cands[s] = per-predecessor totals into state s
        def cands(s: Column) -> Column:
            return F.transform(
                states,
                lambda p: F.element_at(acc["scores"], p)
                + F.element_at(F.element_at(F.col("_trans"), p), s),
            )

        def best_prev(s: Column) -> Column:  # first (lowest-index) argmax
            c = cands(s)
            return F.array_position(c, F.array_max(c)).cast("int")

        return F.struct(
            F.transform(
                states,
                lambda s: F.array_max(cands(s))
                + F.element_at(F.element_at(F.col("_emit"), tok), s),
            ).alias("scores"),
            F.transform(
                states,
                lambda s: F.concat_ws(
                    ",",
                    F.element_at(acc["paths"], best_prev(s)),
                    (s - 1).cast("string"),
                ),
            ).alias("paths"),
        )

    fin = F.aggregate(
        F.slice(F.col("obs"), 2, F.greatest(F.size("obs") - 1, F.lit(0))),
        init,
        step,
    )
    best = F.array_position(fin["scores"], F.array_max(fin["scores"])).cast(
        "int"
    )
    return out.select(
        "seq_id",
        F.size("obs").cast("long").alias("n"),
        F.element_at(fin["paths"], best).alias("path"),
        F.array_max(fin["scores"]).cast("long").alias("best_score"),
    )
