"""Milne-Witten relatedness (graph/linkpred.milne_witten) and
gazetteer leftmost-longest spotting (link/gazetteer.spot_phrases)
gates: Python replay of the ln-ppm chain, identical-inlink-set zero
distance, zero-common exclusion; a reference Python lexer scan, the
longest-at-position preference, disjointness/sortedness invariants
and the no-match-doc absence."""

from __future__ import annotations

import math

from spanluke_spark.graph.linkpred import milne_witten
from spanluke_spark.link.gazetteer import spot_phrases


def lnppm(x: int) -> int:
    return int(round(math.log(x) * 1_000_000))


def mw_fixture():
    # inlinks: t1 <- {a,b,c}; t2 <- {a,b,c} (identical); t3 <- {a,d};
    # t4 <- {e} (disjoint from t1/t2 except nothing shared)
    edges = []
    for s in "abc":
        edges += [(s, "t1"), (s, "t2")]
    edges += [("a", "t3"), ("d", "t3"), ("e", "t4")]
    return edges


def py_mw(edges):
    inl = {}
    nodes = set()
    for s, d in set(edges):
        inl.setdefault(d, set()).add(s)
        nodes.update((s, d))
    n = len(nodes)
    out = {}
    ts = sorted(inl)
    for i, u in enumerate(ts):
        for v in ts[i + 1 :]:
            common = len(inl[u] & inl[v])
            if not common:
                continue
            du, dv = len(inl[u]), len(inl[v])
            num = lnppm(max(du, dv)) - lnppm(common)
            den = lnppm(n) - lnppm(min(du, dv))
            out[(u, v)] = (
                common,
                du,
                dv,
                n,
                num * 1_000_000 // den if den > 0 else None,
            )
    return out


def test_milne_witten_matches_python_replay(spark):
    edges = mw_fixture()
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["u"], r["v"]): r for r in milne_witten(df).collect()}
    want = py_mw(edges)
    assert set(got) == set(want)
    for k, (common, du, dv, n, ppm) in want.items():
        r = got[k]
        assert (
            r["common"],
            r["deg_u"],
            r["deg_v"],
            r["n_nodes"],
            r["mw_ppm"],
        ) == (common, du, dv, n, ppm), k
    # identical inlink sets -> distance 0
    assert got[("t1", "t2")]["mw_ppm"] == 0
    # t4 shares no inlink with anything -> appears in no pair
    assert not any("t4" in k for k in got)
    # partial overlap is strictly positive
    assert got[("t1", "t3")]["mw_ppm"] > 0


def py_spot(tokens, dic, max_len=3):
    out = []
    i = 0
    while i < len(tokens):
        hit = None
        for n in range(min(max_len, len(tokens) - i), 0, -1):
            p = " ".join(tokens[i : i + n])
            if p in dic:
                hit = (i, i + n, p)
                break
        if hit:
            out.append(hit)
            i = hit[1]
        else:
            i += 1
    return out


def gaz_fixture():
    dic = {"new york", "new york city", "york", "city", "in", "big"}
    docs = [
        (1, "i live in new york city in a big flat"),
        (2, "york city new"),
        (3, "nothing matches here"),
        (4, "new york new york city york"),
    ]
    return docs, dic


def test_gazetteer_matches_python_lexer(spark):
    docs, dic = gaz_fixture()
    ddf = spark.createDataFrame(docs, "id long, text string")
    dicdf = spark.createDataFrame([(p,) for p in dic], "phrase string")
    got = spot_phrases(ddf, dicdf).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["id"], []).append((r["s"], r["e"], r["phrase"]))
    for i, text in docs:
        want = py_spot(text.split(), dic)
        assert sorted(by_doc.get(i, [])) == want, i
    # doc 3 has no matches and is absent entirely
    assert 3 not in by_doc
    # longest wins: doc 1 selects 'new york city', never bare 'york'
    assert (3, 6, "new york city") in by_doc[1]
    assert all(p != "york" for _, _, p in by_doc[1])


def test_gazetteer_selected_spans_disjoint_and_sorted(spark):
    docs, dic = gaz_fixture()
    ddf = spark.createDataFrame(docs, "id long, text string")
    dicdf = spark.createDataFrame([(p,) for p in dic], "phrase string")
    rows = spot_phrases(ddf, dicdf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append((r["s"], r["e"]))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 <= s2  # disjoint, ordered
