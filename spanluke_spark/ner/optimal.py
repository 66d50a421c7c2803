"""Optimal non-overlapping span selection — weighted interval scheduling
over the span-enumeration lattice (SURVEY.md §2.9; span semantics pinned
by the reference's IOB2 reconstruction, legal_ner/main.py:402-406).

The reference (and ner/decode.py) decodes GREEDILY: take spans in score
order, skip overlaps. Greedy can leave total score on the table — two
short mentions beating one long high-scorer. This module computes the
provably score-maximal non-overlapping selection with the classic
O(k log k) DP (sort by span end, binary-search the rightmost compatible
predecessor, take-on-strict-improvement backtrack — deterministic by
construction).

Scale shape: the DP is PER SENTENCE over at most ``n * max_length``
candidate spans — bounded, driver-free work inside the same Arrow
``mapInPandas`` seam as greedy_decode; spans are re-enumerated inside
the kernel and never materialize in a shuffle.
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .spans import ENTITY_MAX_LENGTH, py_enumerate_spans

__all__ = ["py_optimal_decode_mentions", "optimal_decode"]


def py_optimal_decode_mentions(
    num_words: int,
    spans: list[tuple[int, int]],
    scores: list[float],
    pred_labels: list[int],
    outside_id: int,
    id2label: dict[int, str],
) -> list[tuple[int, int, str, float]]:
    """Maximum-total-score set of pairwise non-overlapping non-outside
    spans, as (w_start, w_end, label, score) sorted by w_start.

    Deterministic: candidates sort by (end, start); backtracking takes a
    span only on STRICT improvement, so among equal-total selections the
    one using later-sorted spans least wins."""
    cands = sorted(
        (
            (we, ws, float(sc), int(pl))
            for (ws, we), sc, pl in zip(spans, scores, pred_labels)
            if pl != outside_id
        ),
    )
    k = len(cands)
    if k == 0:
        return []
    ends = [c[0] for c in cands]
    # f[i] = best total over the first i candidates (f[0] = 0)
    f = [0.0] * (k + 1)
    pred = [0] * k  # number of candidates ending at or before this start
    for i, (we, ws, sc, _pl) in enumerate(cands):
        pred[i] = bisect_right(ends, ws)
        f[i + 1] = max(f[i], f[pred[i]] + sc)
    out: list[tuple[int, int, str, float]] = []
    i = k
    while i > 0:
        if f[i] > f[i - 1]:
            we, ws, sc, pl = cands[i - 1]
            lbl = id2label[pl].split("-")[-1]
            out.append((ws, we, lbl, sc))
            i = pred[i - 1]
        else:
            i -= 1
    out.reverse()
    return out


def optimal_decode(
    scored: DataFrame,
    doc_cols: list[str],
    id2label: dict[int, str],
    outside_id: int = 0,
    max_length: int = ENTITY_MAX_LENGTH,
) -> DataFrame:
    """Distributed optimal decode over sentence rows (same contract as
    ner/decode.greedy_decode: doc_cols..., num_words:int,
    scores:array<double>, preds:array<int> in reference span order) ->
    (doc_cols..., w_start, w_end, label, score)."""
    out_fields = ", ".join(
        f"`{c}` {scored.schema[c].dataType.simpleString()}" for c in doc_cols
    )
    out_schema = f"{out_fields}, w_start int, w_end int, label string, score double"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in doc_cols}
            rows.update({"w_start": [], "w_end": [], "label": [], "score": []})
            for rec in pdf.itertuples(index=False):
                d = rec._asdict()
                n = int(d["num_words"])
                spans = py_enumerate_spans(n, max_length)
                for ws, we, lbl, sc in py_optimal_decode_mentions(
                    n, spans, list(d["scores"]), list(d["preds"]), outside_id, id2label
                ):
                    for c in doc_cols:
                        rows[c].append(d[c])
                    rows["w_start"].append(ws)
                    rows["w_end"].append(we)
                    rows["label"].append(lbl)
                    rows["score"].append(sc)
            yield pd.DataFrame(rows)

    return scored.select(*doc_cols, "num_words", "scores", "preds").mapInPandas(
        _decode, out_schema
    )
