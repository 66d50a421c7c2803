"""SPARQL-lite: compile a basic graph pattern (BGP) into a DataFrame
join plan — the query surface a (subj, pred, obj) store owes its users.

    bgp_query(triples, "?c decided_by ?j . ?j located_in ?r")

returns one column per variable, one row per solution mapping (SPARQL
set semantics via the closing distinct; pass distinct=False for bag
semantics). Each triple pattern becomes a filtered projection of the
triple table; patterns join NATURALLY on shared variables, so Catalyst
sees ordinary equi-joins it can reorder, broadcast, and push filters
through — the BGP is declared, not interpreted. A pattern with no
shared variable against the accumulated plan is a genuine Cartesian
product (as in SPARQL); it is compiled as an explicit crossJoin so the
cost is visible in the plan rather than smuggled in.

Literals are plain tokens, variables start with ``?``. A variable
repeated WITHIN one pattern (e.g. ``?x knows ?x``) compiles to an
equality filter. One property path is supported: a LITERAL predicate
ending in ``+`` (``?c subclass_of+ ?top``) compiles to the transitive
closure of that predicate's edge set via graph/closure.py path doubling
— O(log diameter) joins, materialized once per pattern. Two more path
forms compose with it: INVERSE ``^pred`` (edge reversed) and
ALTERNATION ``a|b`` (either predicate); modifiers wrap the whole token,
so ``^a|b+`` means inverse-closure over the union edge set of a and b.
OPTIONAL blocks and simple FILTERs are supported as keyword args:

    bgp_query(t, "?c decided_by ?j", optional=["?c appealed_to ?a"],
              filters=["?j != ?a", "?c < c40"])

Each ``optional`` entry is its own BGP compiled the same way and
LEFT-joined onto the required plan on the shared variables — SPARQL's
OPTIONAL for well-designed patterns (each block joins the REQUIRED
group; nested/interdependent optionals are the documented cut line).
Each ``filters`` entry is one comparison ``term op term`` with op in
{=, !=, <, <=, >, >=}; terms are variables or literals, comparison is
lexicographic on the string store (there are no typed literals here).
Filters apply to the whole solution after optionals, with SQL NULL
semantics: a comparison on an unbound optional variable is false —
matching SPARQL, where an error eliminates the row. Negation
(MINUS/NOT EXISTS) stays out — compose a left_anti on the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POSITIONS = ["subj", "pred", "obj"]


def _parse(pattern: str) -> list[tuple[str, str, str]]:
    out = []
    for clause in pattern.split("."):
        clause = clause.strip()
        if not clause:
            continue
        parts = clause.split()
        if len(parts) != 3:
            raise ValueError(f"BGP clause needs 3 terms: {clause!r}")
        out.append(tuple(parts))
    if not out:
        raise ValueError("empty basic graph pattern")
    return out


_FILTER_OPS = ["!=", "<=", ">=", "=", "<", ">"]  # two-char ops first


def _term_col(tok: str, columns: set[str]):
    if tok.startswith("?"):
        var = tok[1:]
        if var not in columns:
            raise ValueError(f"filter variable ?{var} not bound in pattern")
        return F.col(var)
    return F.lit(tok)


def _compile_filter(expr: str, columns: set[str]):
    for op in _FILTER_OPS:
        if f" {op} " in expr:
            left, right = expr.split(f" {op} ", 1)
            a = _term_col(left.strip(), columns)
            b = _term_col(right.strip(), columns)
            return {
                "=": a == b, "!=": a != b, "<": a < b,
                "<=": a <= b, ">": a > b, ">=": a >= b,
            }[op]
    raise ValueError(f"unsupported filter: {expr!r}")


def bgp_query(
    triples: DataFrame,
    pattern: str,
    distinct: bool = True,
    optional: list[str] | None = None,
    filters: list[str] | None = None,
) -> DataFrame:
    """triples(subj, pred, obj) x BGP string -> one column per ?var."""
    plan: DataFrame | None = None
    for terms in _parse(pattern):
        step = triples
        positions = _POSITIONS
        pred = terms[1]
        inv = pred.startswith("^")
        plus = pred.endswith("+") and len(pred.rstrip("+")) > 0
        body = pred.lstrip("^").rstrip("+")
        alts = body.split("|") if body else [body]
        has_path = inv or plus or len(alts) > 1
        if has_path and pred.startswith("?"):
            raise ValueError("property path needs a literal predicate")
        if has_path:
            # property-path pattern: ^inverse, a|b alternation, + closure
            # (composable: "^(a|b)+" without the parens — ^a|b+ reads as
            # modifiers around the whole alternation)
            if any(a.startswith("?") or not a for a in alts):
                raise ValueError("property path needs literal predicates")
            base = triples.where(F.col("pred").isin(alts)).select("subj", "obj")
            if inv:
                base = base.select(
                    F.col("obj").alias("subj"), F.col("subj").alias("obj")
                )
            if plus:
                from .closure import transitive_closure

                step = transitive_closure(base, "subj", "obj")
            else:
                step = base
            terms = (terms[0], terms[2])
            positions = ["subj", "obj"]
        cols: dict[str, str] = {}  # var -> first position bound
        for pos, term in zip(positions, terms):
            if term.startswith("?"):
                var = term[1:]
                if not var:
                    raise ValueError("bare '?' is not a variable")
                if var in cols:  # repeated var inside one pattern
                    step = step.where(
                        F.col(pos) == F.col(cols[var])
                    )
                else:
                    cols[var] = pos
            else:
                step = step.where(F.col(pos) == term)
        step = step.select(
            *[F.col(pos).alias(var) for var, pos in cols.items()]
        )
        if plan is None:
            plan = step
        else:
            shared = sorted(set(plan.columns) & set(step.columns))
            plan = (
                plan.join(step, shared) if shared else plan.crossJoin(step)
            )
    for opt in optional or []:
        block = bgp_query(triples, opt, distinct=False)
        shared = sorted(set(plan.columns) & set(block.columns))
        if not shared:
            raise ValueError(
                f"OPTIONAL block shares no variable with the pattern: {opt!r}"
            )
        plan = plan.join(block, shared, "left")
    for f in filters or []:
        plan = plan.where(_compile_filter(f, set(plan.columns)))
    return plan.distinct() if distinct else plan
