"""Structural integrity gates for __spark_entry__.py — added after
session-22's full-suite sweep caught two module-level oracle-SQL
constants being silently REDEFINED (q405's `_KNN_ORACLE_SQL`
clobbered q253's DuckDB twin, q457's `_DUNN_ORACLE_SQL` clobbered
q415's): in a 29k-line registry module, a name collision rebinds
every earlier dict entry that used the name, and nothing fails until
a value gate runs. These gates make the failure immediate and
pinpointed instead.

1. no module-level `_UPPER_CASE = ` constant is assigned twice;
2. every registry (queries / oracle_sql / extra_queries /
   extra_oracle_sql) pairs up 1:1 with its twin;
3. the driver registry stays exactly 50 entries (the driver's
   correctness-window contract, __spark_entry__.queries docstring);
4. every oracle SQL string is non-empty and distinct from every
   other oracle's (two registry keys sharing one SQL object is
   exactly the clobbering symptom).
"""

from __future__ import annotations

import ast
import os
from collections import Counter

# r6 (ADVICE): derive from the test's own location so the gates run on any
# checkout, like the rest of the suite
ENTRY = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")


def _src():
    with open(ENTRY) as fh:
        return fh.read()


def test_no_duplicate_module_constants():
    # r6 (ADVICE): parse with ast instead of a line-anchored regex — a line
    # inside a triple-quoted oracle SQL that happens to start with
    # `_UPPER = ` must neither false-positive nor mask a real duplicate.
    tree = ast.parse(_src())
    names = []
    for node in tree.body:
        targets = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            targets = [node.target]
        for t in targets:
            if isinstance(t, ast.Name) and t.id.startswith("_") and t.id.upper() == t.id:
                names.append(t.id)
    dups = {k: v for k, v in Counter(names).items() if v > 1}
    assert dups == {}, f"redefined module constants: {dups}"


def test_registries_pair_up():
    import __spark_entry__ as e

    qs, oq = e.queries(), e.oracle_sql()
    assert set(qs) == set(oq)
    assert len(qs) == 50
    xq, xo = e.extra_queries(), e.extra_oracle_sql()
    assert set(xq) == set(xo)
    assert not (set(qs) & set(xq))


# Pairs DOCUMENTED as sharing one oracle on purpose (two Spark
# formulations proved identical against the same expected output —
# q191's docstring states it). Anything else sharing SQL is a bug.
_INTENTIONALLY_SHARED = {
    frozenset({"q190_legal_facts_extended", "q191_legal_facts_onepass"}),
    # q252 streams the SAME corpus into the q239 batch sketch and must
    # equal it bit-for-bit (its docstring states it) — one oracle.
    frozenset({"q239_hll", "q252_streaming_hll"}),
}


def test_oracle_sql_distinct_and_nonempty():
    import __spark_entry__ as e

    all_sql = {**e.oracle_sql(), **e.extra_oracle_sql()}
    seen = {}
    for key, sql in sorted(all_sql.items()):
        assert sql and sql.strip(), f"{key}: empty oracle SQL"
        norm = " ".join(sql.split())
        if norm in seen:
            pair = frozenset({key, seen[norm]})
            assert pair in _INTENTIONALLY_SHARED, (
                f"{key} shares its oracle SQL verbatim with"
                f" {seen[norm]} — a constant-name collision symptom"
            )
        seen[norm] = key
