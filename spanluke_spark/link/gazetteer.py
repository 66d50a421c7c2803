"""Gazetteer phrase spotting with leftmost-longest resolution — the
dictionary-matching front end of entity linking (the Aho-Corasick
use-case, expressed relationally): spot every dictionary phrase
occurrence in every document, then resolve overlaps exactly the way a
lexer does — scan left to right, at each position prefer the LONGEST
match, skip anything overlapping an accepted match.

Distributed shape: candidate matches come from joining length-L token
n-grams (a native slice/transform HOF per L — L is a small constant,
no Python) against the BROADCAST dictionary; the sequential greedy
scan is per-document over that document's bounded match list, run as
ONE native aggregate fold over the (start asc, end desc)-sorted match
array — no Python, no window chains, documents scale out
embarrassingly. The same fold replays in SQL as list_reduce (the
q280 greedy-scan pattern).

Matches are exact token spans [s, e) (0-based); the greedy invariant
— selected spans are disjoint, sorted, and each is the longest match
at the leftmost position not covered by an earlier selection — is
asserted by reconstruction in the tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["spot_phrases"]


def spot_phrases(
    docs: DataFrame,
    dictionary: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    phrase_col: str = "phrase",
    max_len: int = 3,
) -> DataFrame:
    """docs (id, text) x dictionary (phrase: space-joined tokens, at
    most max_len tokens) -> (id, s, e, phrase): leftmost-longest
    non-overlapping dictionary matches, token-span [s, e)."""
    base = docs.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias(
            "arr"
        ),
    )
    cands = None
    for n in range(1, max_len + 1):
        g = base.select(
            "id",
            F.when(
                F.size("arr") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("arr") - n),
                    lambda i: F.struct(
                        i.cast("int").alias("s"),
                        (i + n).cast("int").alias("e"),
                        F.concat_ws(
                            " ", F.slice("arr", i + 1, n)
                        ).alias("phrase"),
                    ),
                ),
            )
            .otherwise(F.array().cast(
                "array<struct<s:int,e:int,phrase:string>>"
            ))
            .alias("gs"),
        ).select("id", F.explode("gs").alias("g")).select(
            "id", "g.s", "g.e", "g.phrase"
        )
        cands = g if cands is None else cands.unionByName(g)
    dic = dictionary.select(F.col(phrase_col).alias("phrase")).distinct()
    matches = cands.join(F.broadcast(dic), "phrase")
    per_doc = matches.groupBy("id").agg(
        F.expr(
            "array_sort(collect_list(struct(s, -e as ne, e, phrase)))"
        ).alias("ms")
    )
    folded = per_doc.select(
        "id",
        F.expr(
            "aggregate(ms,"
            " named_struct('last_e', -1,"
            "  'sel', cast(array() as"
            "   array<struct<s:int,e:int,phrase:string>>)),"
            " (acc, m) -> CASE WHEN m.s >= acc.last_e THEN"
            "   named_struct('last_e', cast(m.e as int),"
            "    'sel', acc.sel || array(struct(m.s as s, m.e as e,"
            "     m.phrase as phrase)))"
            "  ELSE acc END,"
            " acc -> acc.sel)"
        ).alias("sel"),
    )
    return folded.select("id", F.explode("sel").alias("m")).select(
        "id", "m.s", "m.e", "m.phrase"
    )
