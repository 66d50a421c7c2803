"""Byte-level BPE tokenization (GPT-2 family) with first-subtoken label
alignment — the real analog of the reference's RobertaTokenizerFast
(legal_ner/utils/dataset.py:163-189 tokenizes with a byte-level-BPE
tokenizer; requirements.txt pins transformers), sibling of
``etl/wordpiece.py``.

The three moving parts, all deterministic and engine-replayable:

1. **Byte→unicode alphabet** (public GPT-2 ``bytes_to_unicode`` scheme):
   printable latin-1 bytes map to themselves, everything else shifts into
   U+0100.. so every byte is a visible character (space -> 'Ġ'). Reversible,
   so detokenization is exact byte round-trip.
2. **Pre-tokenization**: ``PRETOKEN_RE`` splits text into word-ish chunks
   that BPE never merges across. The full GPT-2 pattern needs negative
   lookahead + unicode categories (the ``regex`` package, absent here), so
   this is the documented ASCII subset of it — identical in Python ``re``,
   Java regex (Spark) and RE2 (DuckDB), which keeps the q37 oracle exact.
3. **Merges**: a frozen ranked merge table (``bpe_merges.txt``, trained by
   ``train_bpe_merges`` — greedy highest-count pair, lexicographic
   tie-break, so training is bit-deterministic). ``py_bpe`` applies them
   with the standard lowest-rank-first loop.

Equivalence used by the DuckDB oracle: because merges are learned greedily,
applying them **sequentially in rank order** (each merge replacing all its
adjacent occurrences left-to-right, repeated to fixpoint) yields the same
segmentation as the priority loop — which a SQL engine can replay as a
chain of ``replace()`` calls over a sentinel-delimited symbol string. The
pytest parity suite pins Spark == py_bpe == that sequential formulation.

Alignment mirrors dataset.py:163-189: pre-token index = word id; the first
subtoken of each word carries the word's label; continuations get the label
(label_all_tokens) or -100.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ASCII subset of the GPT-2 pre-tokenizer (see module docstring, point 2):
# optional leading space glued to a letter-run / digit-run / punct-run;
# bare space runs otherwise.
PRETOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+| +"

MERGES_PATH = os.path.join(os.path.dirname(__file__), "bpe_merges.txt")
IGNORE_INDEX = -100


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte->unicode table: visible latin-1 bytes identity,
    the rest mapped to U+0100+i in order (0x20 -> 'Ġ', 0x0A -> 'Ċ', ...)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAD))
        + list(range(0xAE, 0x100))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


@lru_cache(maxsize=1)
def unicode_to_bytes() -> dict[str, int]:
    return {v: k for k, v in bytes_to_unicode().items()}


def to_unicode(pretoken: str) -> str:
    b2u = bytes_to_unicode()
    return "".join(b2u[b] for b in pretoken.encode("utf-8"))


def from_unicode(token: str) -> str:
    """Single-token display form. A multi-byte UTF-8 codepoint can be SPLIT
    across token boundaries (BPE merges bytes, not codepoints), so a lone
    token may hold a partial sequence — rendered with U+FFFD here. For exact
    reconstruction always use :func:`detokenize`, which concatenates the
    byte stream before decoding once."""
    u2b = unicode_to_bytes()
    return bytes(u2b[c] for c in token).decode("utf-8", errors="replace")


def detokenize(tokens: list[str]) -> str:
    """Exact inverse of tokenization for ANY input: map every alphabet char
    of every token back to its byte, then UTF-8-decode the whole stream once
    (the standard byte-level-BPE decode — per-token decoding would tear
    codepoints whose bytes BPE distributed across two tokens)."""
    u2b = unicode_to_bytes()
    return bytes(u2b[c] for tok in tokens for c in tok).decode("utf-8")


def py_pretokenize(text: str) -> list[str]:
    return re.findall(PRETOKEN_RE, text)


def py_bpe(unicode_pretoken: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE: repeatedly merge the lowest-rank adjacent pair."""
    syms = list(unicode_pretoken)
    while len(syms) > 1:
        pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
        best = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if best not in ranks:
            break
        merged: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                merged.append(syms[i] + syms[i + 1])
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def py_tokenize(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    out: list[str] = []
    for pt in py_pretokenize(text):
        out.extend(py_bpe(to_unicode(pt), ranks))
    return out


class CachedBPE:
    """Per-executor BPE with a bounded pretoken cache — web text repeats its
    vocabulary constantly (Zipf), so almost every pretoken after warmup is a
    dict hit instead of a merge loop. Cache evicts wholesale at ``cap``
    (simple and branch-free; a 64k-entry cache covers any realistic batch
    vocabulary). This is what the Spark kernels use; ``py_bpe`` stays the
    uncached ground-truth for parity tests."""

    def __init__(self, ranks: dict[tuple[str, str], int], cap: int = 65536):
        self.ranks = ranks
        self.cap = cap
        self._cache: dict[str, list[str]] = {}

    def pretoken(self, pt: str) -> list[str]:
        hit = self._cache.get(pt)
        if hit is None:
            if len(self._cache) >= self.cap:
                self._cache.clear()
            hit = self._cache[pt] = py_bpe(to_unicode(pt), self.ranks)
        return hit

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for pt in py_pretokenize(text):
            out.extend(self.pretoken(pt))
        return out


def train_bpe_merges(texts: list[str], num_merges: int = 200) -> list[tuple[str, str]]:
    """Deterministic greedy BPE training: at each step merge the
    highest-count adjacent pair over the pretoken frequency table;
    ties break on the lexicographically smallest pair."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for pt in py_pretokenize(t):
            words[tuple(to_unicode(pt))] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += c
        if not pair_counts:
            break
        best_count = max(pair_counts.values())
        if best_count < 2:
            break
        best = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best)
        new_words = Counter()
        for syms, c in words.items():
            merged: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    merged.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_words[tuple(merged)] += c
        words = new_words
    return merges


def _disjoint_merge_batch(
    cands: list[tuple[str, int]],
    sep: str,
    min_count: int,
    truncated: bool,
) -> list[tuple[str, str]]:
    """Longest batch of merges provably order-identical to sequential BPE.

    Scan candidates in (count desc, pair lex asc) order, keeping pairs whose
    symbols are disjoint from every pair already kept; stop at the first
    interacting candidate. Then keep only the prefix with count STRICTLY
    above ``n*`` — the first interacting candidate's count (or the last
    collected count if the list was truncated, or min_count-1 otherwise).

    Why this is bit-identical to one-merge-at-a-time: applying a merge
    (a, b) never increases any existing pair's count, leaves counts of
    symbol-disjoint pairs unchanged, and every NEWLY-created pair contains
    the merged symbol, with count bounded by some existing pair involving a
    or b — an *interacting* pair, which by the stop rule ranks below, and by
    the strict n* cut counts below, every kept candidate. So after applying
    kept merge i, the sequential trainer's next argmax is exactly kept merge
    i+1. The first candidate alone is always safe (plain sequential step).

    One gap in that argument is closed by an explicit guard: "never
    increases any existing pair's count" fails if a candidate contains the
    CONCATENATED string a+b of an earlier kept merge (or a kept symbol) as
    one of its own symbols — applying (a, b) then mints new copies of that
    string, so the later pair's stale rank could understate it (and in the
    s == kept-symbol case, the sequential trainer could even re-merge an
    already-applied pair between recounts). That state needs the pair
    (a, b) to have positive count while the string a+b already exists as a
    symbol via a different merge path, which a randomized search over 8k
    adversarial corpora never reached from a char-level start — but the
    batch cut enforces it anyway: candidates touching any kept pair's
    produced string (or producing a kept symbol) end the batch exactly like
    a shared-symbol interaction. Costs nothing when unreachable; keeps the
    bit-identity claim unconditional.
    """
    selected: list[tuple[str, str]] = []
    counts: list[int] = []
    used: set[str] = set()
    produced: set[str] = set()
    n_star = (cands[-1][1] if truncated else min_count - 1) if cands else 0
    for pair, n in cands:
        a, b = pair.split(sep)
        ab = a + b
        if (
            a in used or b in used
            or a in produced or b in produced
            or ab in used or ab in produced
        ):
            n_star = n
            break
        selected.append((a, b))
        counts.append(n)
        used.add(a)
        used.add(b)
        produced.add(ab)
    keep = 0
    for i, n in enumerate(counts):
        if i == 0 or n > n_star:
            keep = i + 1
        else:
            break
    return selected[:keep]


def train_bpe_merges_spark(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_count: int = 2,
    checkpoint_every: int = 8,
    batch_top_k: int = 256,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Distributed BPE training — learn the merges table ON the cluster,
    bit-identical to the driver-side ``train_bpe_merges`` (same greedy
    highest-count pair, same lexicographic tie-break; pinned by parity test).

    Scale shape: the working state is the PRETOKEN VOCABULARY table
    (pretoken-symbol-array, corpus count) — a groupBy that collapses a
    10^12-doc corpus to its distinct pretokens (Zipf: ~10^7-10^8 rows) once,
    up front. Each ROUND is then two small jobs over the vocab table:
    (1) adjacent-pair counts -> the top ``batch_top_k`` rows reach the
    driver, where ``_disjoint_merge_batch`` picks the longest run of merges
    provably identical to one-at-a-time selection; (2) ALL of them applied
    to every symbol array in ONE ``F.aggregate`` fold (left-to-right
    non-overlapping, carry + map lookup in the accumulator — pure JVM, no
    Python). A 50k-merge vocabulary therefore costs hundreds of rounds, not
    50k sequential jobs (the round count is returned via ``stats``).
    ``localCheckpoint`` every ``checkpoint_every`` rounds truncates the
    growing fold lineage. Python appears exactly once, in the initial
    byte-alphabet split (vectorized pandas UDF)."""

    @F.pandas_udf("array<string>")
    def _to_syms(s: pd.Series) -> pd.Series:
        return s.map(lambda pt: list(to_unicode(pt)))

    vocab = (
        df.select(
            F.explode(F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), 0)).alias(
                "pt"
            )
        )
        .groupBy("pt")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(_to_syms("pt").alias("syms"), "c")
        .localCheckpoint(eager=True)
    )

    sep = "\x00"  # never in the byte alphabet
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < num_merges:
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                    F.slice("syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))),
                    lambda a, b: F.concat(a, F.lit(sep), b),
                )
            ).alias("pair"),
            "c",
        ).groupBy("pair").agg(F.sum("c").alias("n"))
        top = pairs.orderBy(F.desc("n"), F.asc("pair")).limit(batch_top_k).collect()
        rounds += 1
        if not top or top[0]["n"] < min_count:
            break
        cands = [(r["pair"], int(r["n"])) for r in top if r["n"] >= min_count]
        batch = _disjoint_merge_batch(
            cands, sep, min_count, truncated=len(top) == batch_top_k
        )[: num_merges - len(merges)]
        merges.extend(batch)

        # ONE left-to-right non-overlapping fold applying the whole batch:
        # carry holds the previous unmerged symbol ('' = empty carry); the
        # batch rides as a tiny literal map (carry+sep+x -> merged symbol).
        # Batch merges are pairwise symbol-disjoint, so simultaneous
        # application equals sequential application.
        mmap = F.create_map(
            *[F.lit(v) for a, b in batch for v in (a + sep + b, a + b)]
        )
        init = F.struct(
            F.array().cast("array<string>").alias("out"), F.lit("").alias("carry")
        )

        def step(acc, x):
            merged = mmap[F.concat(acc["carry"], F.lit(sep), x)]
            return F.when(
                acc["carry"] == "",
                F.struct(acc["out"].alias("out"), x.alias("carry")),
            ).otherwise(
                F.when(
                    merged.isNotNull(),
                    F.struct(
                        F.concat(acc["out"], F.array(merged)).alias("out"),
                        F.lit("").alias("carry"),
                    ),
                ).otherwise(
                    F.struct(
                        F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                        x.alias("carry"),
                    )
                )
            )

        vocab = vocab.select(
            F.aggregate(
                "syms",
                init,
                step,
                lambda acc: F.when(acc["carry"] == "", acc["out"]).otherwise(
                    F.concat(acc["out"], F.array(acc["carry"]))
                ),
            ).alias("syms"),
            "c",
        )
        if rounds % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    if stats is not None:
        stats["rounds"] = rounds
        stats["merges"] = len(merges)
    return merges


def save_merges(merges: list[tuple[str, str]], path: str = MERGES_PATH) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for a, b in merges:
            f.write(f"{a}\t{b}\n")


@lru_cache(maxsize=4)
def load_merges(path: str = MERGES_PATH) -> tuple[tuple[str, str], ...]:
    """Reads the frozen merges table. Accepts both this repo's tab-separated
    format and the published GPT-2/HF ``merges.txt`` format (space-separated
    pairs, optional ``#version`` header) — so a user can point MERGES_PATH at
    a real published tokenizer's merges file unchanged.

    Only a leading ``#version`` line (or a first line starting with ``#``
    that does not parse as a pair) is treated as a header: ``#`` is a real
    printable byte-alphabet symbol, so published GPT-2/HF merges files
    contain genuine merges like ``# #`` and ``## #`` that must NOT be
    skipped — dropping them would silently shift every subsequent rank."""
    out: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for lineno, line in enumerate(f):
            line = line.rstrip("\n")
            if not line.strip():
                continue
            if lineno == 0 and line.startswith("#version"):
                continue
            parts = line.split("\t") if "\t" in line else line.split(" ")
            if len(parts) != 2:
                if lineno == 0 and line.startswith("#"):
                    continue  # non-standard comment header
                raise ValueError(f"{path}:{lineno + 1}: not a merge pair: {line!r}")
            out.append((parts[0], parts[1]))
    return tuple(out)


def merge_ranks(merges: tuple[tuple[str, str], ...] | None = None) -> dict:
    merges = merges if merges is not None else load_merges()
    return {pair: i for i, pair in enumerate(merges)}


def bpe_tokenize(
    df: DataFrame,
    key_cols: list[str],
    text_col: str = "text",
    merges_path: str = MERGES_PATH,
) -> DataFrame:
    """-> key_cols + word_id + token_id + token (+ is_first flag).

    One Arrow-batched mapInPandas pass; the frozen merges table rides to
    executors via closure capture (a few KB — no broadcast machinery
    needed). Pre-token index = word id, exactly the HF word_ids() contract
    the reference aligns labels with (dataset.py:170-186)."""
    merges = load_merges(merges_path)
    schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in key_cols
    ) + ", word_id int, token_id int, token string, is_first boolean"

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bpe = CachedBPE({pair: i for i, pair in enumerate(merges)})
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                tid = 0
                for wid, pt in enumerate(py_pretokenize(r[text_col] or "")):
                    for j, tok in enumerate(bpe.pretoken(pt)):
                        rows.append(
                            tuple(r[c] for c in key_cols) + (wid, tid, tok, j == 0)
                        )
                        tid += 1
            yield pd.DataFrame(
                rows,
                columns=key_cols + ["word_id", "token_id", "token", "is_first"],
            )

    return df.select(*key_cols, text_col).mapInPandas(_gen, schema)


def bpe_token_count(
    df: DataFrame, text_col: str = "text", merges_path: str = MERGES_PATH
) -> DataFrame:
    """Adds ``n_bpe_tokens``: REAL byte-level-BPE token count (replaces the
    regex estimate ``textops.quality.bpe_ish_token_count``). Vectorized
    pandas UDF — one Python stage, no shuffle."""
    merges = load_merges(merges_path)

    @F.pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        bpe = CachedBPE({pair: i for i, pair in enumerate(merges)})
        return s.map(lambda t: len(bpe.tokenize(t or "")))

    return df.withColumn("n_bpe_tokens", _count(F.col(text_col)))


def align_labels_bpe(
    tokens: DataFrame,
    word_labels: DataFrame,
    key_cols: list[str],
    label_all_tokens: bool = True,
) -> DataFrame:
    """First-subtoken alignment over ``bpe_tokenize`` output, mirroring
    dataset.py:170-186: join word-level labels on (key, word_id); the first
    subtoken always gets the word label; continuations get the word label
    (label_all_tokens=True, the reference's effective behavior) or -100."""
    joined = tokens.join(word_labels, [*key_cols, "word_id"], "left")
    lbl = F.coalesce(F.col("label_id"), F.lit(IGNORE_INDEX))
    if not label_all_tokens:
        lbl = F.when(F.col("is_first"), lbl).otherwise(F.lit(IGNORE_INDEX))
    return joined.withColumn("label_id", lbl.cast("int"))
