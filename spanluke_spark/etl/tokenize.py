"""Whitespace tokenization with char offsets — exact Python str.split() parity.

The reference tokenizes with ``text.split()`` (legal_ner/utils/convert_dataset.py:43,
count_length.py:15) and maps char spans to word indices with
``len(text[:start].split())`` (convert_dataset.py:37-40). Spark SQL's
``split(col, '\\s+')`` differs on leading/trailing/multiple whitespace, so these
kernels run as vectorized pandas UDFs with the Python semantics preserved
(SURVEY.md §2.8 F1, §7.3).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKENS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("token", T.StringType(), False),
            T.StructField("start", T.IntegerType(), False),
            T.StructField("end", T.IntegerType(), False),
        ]
    )
)


_NONWS = __import__("re").compile(r"\S+")


def py_tokenize_offsets(text: str) -> list[tuple[str, int, int]]:
    """Tokens of ``text.split()`` with (start, end-exclusive) char offsets.

    Maximal runs of non-whitespace via C-speed ``re.finditer(r'\\S+')``:
    CPython's unicode ``\\s`` is implemented with the same
    ``Py_UNICODE_ISSPACE`` table as ``str.isspace``, so the token list is
    identical to ``text.split()`` for every codepoint (verified
    property-based in tests/test_tokenize.py, including exotic whitespace).
    ~4x faster than the per-char Python loop it replaces — this is the
    per-document hot path of every extraction kernel.
    """
    return [(m.group(), m.start(), m.end()) for m in _NONWS.finditer(text)]


def py_tokenize_words(text: str) -> list[str]:
    """Just the tokens of ``text.split()`` (no offsets) — one C-level
    ``findall`` instead of building a (token, start, end) tuple per match.
    r6: the extraction kernels tokenize every document but need char
    offsets only for ACCEPTED mentions; pairing this with
    :func:`py_char_offsets` removes the per-token tuple cost (~35% of the
    kernel) for the overwhelmingly common mention-free positions."""
    return _NONWS.findall(text)


def py_char_offsets(
    text: str, words: list[str], upto: int
) -> tuple[list[int], list[int]]:
    """(starts, ends) for ``words[:upto]`` where ``words`` are ``text``'s
    whitespace tokens in order. Exact: each token is a maximal
    non-whitespace run, so the region between the previous token's end and
    the next token's start is all whitespace and ``text.index(w, pos)``
    can only land on the true token start."""
    starts: list[int] = []
    ends: list[int] = []
    pos = 0
    idx = text.index
    for w in words[:upto]:
        s = idx(w, pos)
        e = s + len(w)
        starts.append(s)
        ends.append(e)
        pos = e
    return starts, ends


def py_word_index(text: str, char_pos: int) -> int:
    """``len(text[:char_pos].split())`` — the reference's char->word mapping
    (legal_ner/utils/convert_dataset.py:38), including its quirk that a
    mid-word position counts the partial word."""
    return len(text[:char_pos].split())


def with_tokens(df: DataFrame, text_col: str = "text", out_col: str = "tokens") -> DataFrame:
    """Add ``out_col: array<struct<token,start,end>>`` via an Arrow-batched UDF."""

    @F.pandas_udf(TOKENS_TYPE)
    def _tok(s: pd.Series) -> pd.Series:
        return s.map(lambda t: py_tokenize_offsets(t) if t is not None else [])

    return df.withColumn(out_col, _tok(F.col(text_col)))


def token_rows(
    df: DataFrame, id_cols: list[str], text_col: str = "text"
) -> DataFrame:
    """Explode a text column into one row per token:
    (id_cols..., tok_idx, token, start, end).

    ``posexplode`` keeps everything JVM-side after the tokenizing UDF.
    """
    tok = with_tokens(df, text_col)
    exploded = tok.select(
        *id_cols, F.posexplode("tokens").alias("tok_idx", "tok")
    )
    return exploded.select(
        *id_cols,
        "tok_idx",
        F.col("tok.token").alias("token"),
        F.col("tok.start").alias("start"),
        F.col("tok.end").alias("end"),
    )


def map_tokenize(
    df: DataFrame, id_cols: list[str], text_col: str = "text"
) -> DataFrame:
    """mapInPandas variant of :func:`token_rows` — single Python hop that never
    materializes the struct array in the shuffle (preferred in the hot path)."""
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols]
        + ["tok_idx int", "token string", "start int", "end int"]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in id_cols}
            rows.update({"tok_idx": [], "token": [], "start": [], "end": []})
            for rec in pdf.itertuples(index=False):
                rec_d = rec._asdict()
                text = rec_d.get(text_col) or ""
                for i, (tokv, s, e) in enumerate(py_tokenize_offsets(text)):
                    for c in id_cols:
                        rows[c].append(rec_d[c])
                    rows["tok_idx"].append(i)
                    rows["token"].append(tokv)
                    rows["start"].append(s)
                    rows["end"].append(e)
            yield pd.DataFrame(rows)

    return df.select(*id_cols, text_col).mapInPandas(_gen, out_schema)
