"""Entity-salience gates (link/salience.py): Python replay of the fixed
formula, title-signal dominance, position clamping for out-of-range
offsets, and deterministic tie-breaking.
"""

import math

from spanluke_spark.link.salience import entity_salience


def _run(spark, mentions, docs):
    m = spark.createDataFrame(mentions, "doc_id long, entity string, start long")
    d = spark.createDataFrame(docs, "doc_id long, n_chars long, title string")
    return entity_salience(m, d).collect()


def ref_salience(n, first_pos, length, in_title):
    ratio = min(first_pos / max(length, 1), 1.0)
    return round((1 + int(in_title)) * math.log1p(n) * (1 - 0.5 * ratio), 6)


def test_formula_replay_and_ranking(spark):
    mentions = [
        (1, "court", 0), (1, "court", 50), (1, "court", 90),
        (1, "statute", 80),
        (1, "judge", 10), (1, "judge", 20),
    ]
    docs = [(1, 100, "In the COURT of appeals")]
    rows = {r.entity: r for r in _run(spark, mentions, docs)}
    assert rows["court"].salience == ref_salience(3, 0, 100, True)
    assert rows["judge"].salience == ref_salience(2, 10, 100, False)
    assert rows["statute"].salience == ref_salience(1, 80, 100, False)
    # title + frequency + early position dominate
    order = sorted(rows.values(), key=lambda r: r.rank)
    assert [r.entity for r in order] == ["court", "judge", "statute"]
    assert rows["court"].in_title and not rows["judge"].in_title


def test_position_clamp_and_tiebreak(spark):
    mentions = [
        (1, "b", 500),  # past the recorded doc length: ratio clamps at 1
        (1, "a", 500),  # identical features: entity-asc tie-break
    ]
    docs = [(1, 100, "none")]
    rows = sorted(_run(spark, mentions, docs), key=lambda r: r.rank)
    assert rows[0].entity == "a" and rows[1].entity == "b"
    assert rows[0].salience == ref_salience(1, 500, 100, False)
    assert rows[0].salience == round(math.log1p(1) * 0.5, 6)
