"""In-text date extraction and ISO normalization — the temporal-scoping
lane of the legal KG. Judgment text anchors facts to dates in a handful
of rigid surface forms ("order dated 12.03.2004", "on 5th January,
1998", "January 5, 1998"); a KG that scopes facts by validity interval
(storage/scd.py, graph/snapshot.py) needs those surfaces collapsed to
one ISO key.

Three lanes, all pure-codegen ``regexp_extract_all`` at the scan (the
quotes/statutes shape — document order preserved by a combined
alternation, per-snippet group extraction in codegen, zero shuffle):

  numeric   12.03.2004 / 12-03-2004 / 12/03/2004   (dd mm yyyy — the
            Indian court convention; a twelve-or-under day is ambiguous
            with US order and is flagged, not guessed)
  dmy_name  5th January, 1998 / 5 January 1998
  mdy_name  January 5, 1998
  year guard: 1500-2199 so section numbers ("Section 1998" has no
  separator match) and page numbers do not alias into dates.

Invalid calendar dates (``31.02.2001``) survive the regex but fail
``try_to_date`` and are emitted with a NULL ``iso`` — the caller decides
whether NULLs are noise or a data-quality signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_dates", "DATE_PATTERNS"]

_Y = r"(1[5-9]\d\d|2[01]\d\d)"
_MONTH = (
    r"(January|February|March|April|May|June|July|August|September|"
    r"October|November|December)"
)
_D = r"(\d{1,2})"

# name -> (regex, day_group, month_group, year_group, month_is_name)
DATE_PATTERNS: dict[str, tuple[str, int, int, int, bool]] = {
    "numeric": (rf"\b{_D}([./-]){_D}\2{_Y}\b", 1, 3, 4, False),
    "dmy_name": (rf"\b{_D}(?:st|nd|rd|th)?\s+{_MONTH},?\s+{_Y}\b", 1, 2, 3, True),
    "mdy_name": (rf"\b{_MONTH}\s+{_D},?\s+{_Y}\b", 2, 1, 3, True),
}

_COMBINED = "|".join(f"(?:{rx})" for rx, *_ in DATE_PATTERNS.values())


def _month_num(name_col):
    """Month name -> '1'..'12' via Spark's own datetime parser (codegen,
    no UDF, no join): parse '<Month> 1 2000' and take month()."""
    return (
        F.month(
            F.try_to_date(
                F.concat(name_col, F.lit(" 1 2000")), "MMMM d yyyy"
            )
        )
        .cast("string")
    )


def snippet_iso(m):
    """ISO date Column from a matched date snippet Column (NULL when the
    surface is not a valid calendar date). Shared by extract_dates and
    the one-pass fact extractor (legalfacts.legal_facts_onepass)."""
    day = F.lit(None).cast("string")
    month = F.lit(None).cast("string")
    year = F.lit(None).cast("string")
    for n, (rx, dg, mg, yg, named) in reversed(DATE_PATTERNS.items()):
        hit = F.regexp_extract(m, rx, 0) != F.lit("")
        mon = F.regexp_extract(m, rx, mg)
        if named:
            mon = _month_num(mon)
        day = F.when(hit, F.regexp_extract(m, rx, dg)).otherwise(day)
        month = F.when(hit, mon).otherwise(month)
        year = F.when(hit, F.regexp_extract(m, rx, yg)).otherwise(year)
    return F.try_to_date(
        F.concat_ws("-", year, F.lpad(month, 2, "0"), F.lpad(day, 2, "0")),
        "yyyy-MM-dd",
    )


def extract_dates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, surface, pattern, iso, ambiguous): one row per
    date occurrence in document order. ``iso`` is a DATE column (NULL
    when the surface is not a valid calendar date); ``ambiguous`` marks
    numeric dates whose day is <= 12 (dd/mm vs mm/dd cannot be told
    apart from the surface alone)."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(_COMBINED), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")

    hit = {
        n: F.regexp_extract(m, rx, 0) != F.lit("")
        for n, (rx, *_) in DATE_PATTERNS.items()
    }
    day = F.lit(None).cast("string")
    month = F.lit(None).cast("string")
    year = F.lit(None).cast("string")
    pattern = F.lit(None).cast("string")
    for n, (rx, dg, mg, yg, named) in reversed(DATE_PATTERNS.items()):
        mon = F.regexp_extract(m, rx, mg)
        if named:
            mon = _month_num(mon)
        day = F.when(hit[n], F.regexp_extract(m, rx, dg)).otherwise(day)
        month = F.when(hit[n], mon).otherwise(month)
        year = F.when(hit[n], F.regexp_extract(m, rx, yg)).otherwise(year)
        pattern = F.when(hit[n], F.lit(n)).otherwise(pattern)

    return (
        df.select(F.col(id_col), snip)
        .select(
            id_col,
            "idx",
            m.alias("surface"),
            pattern.alias("pattern"),
            day.alias("_day"),
            month.alias("_month"),
            year.alias("_year"),
        )
        .select(
            id_col,
            "idx",
            "surface",
            "pattern",
            F.try_to_date(
                F.concat_ws(
                    "-",
                    F.col("_year"),
                    F.lpad("_month", 2, "0"),
                    F.lpad("_day", 2, "0"),
                ),
                "yyyy-MM-dd",
            ).alias("iso"),
            (
                (F.col("pattern") == "numeric") & (F.col("_day").cast("int") <= 12)
            ).alias("ambiguous"),
        )
    )
