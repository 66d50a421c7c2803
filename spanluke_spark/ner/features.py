"""Hashed span featurizer shared by the trainer and the linear backend.

The reference scores spans with LUKE/SpanMarker (legal_ner/main.py:344-357);
this sandbox has no torch, so the REAL learned model here is a hashed-feature
multinomial logistic regression over span surfaces (ner/train.py). The
featurizer below is the train/infer contract: both sides must produce the
identical index list for a surface, so it is versioned (FEATURIZER_VERSION is
stored inside every exported .npz and asserted at load).

Hashing is ``zlib.crc32`` — C-speed, deterministic, identical across
processes/platforms (unlike Python ``hash``), which is all feature hashing
needs; collisions inside ``dim`` buckets are part of the model.
"""

from __future__ import annotations

import zlib

FEATURIZER_VERSION = "spanfeat-v2"
DEFAULT_DIM = 1 << 15


def _h(feat: str, dim: int) -> int:
    return zlib.crc32(feat.encode("utf-8")) % dim


def span_feature_indices(
    surface: str,
    dim: int = DEFAULT_DIM,
    left: tuple[str, ...] = (),
    right: tuple[str, ...] = (),
    gaz_label: str | None = None,
    extra: tuple[str, ...] | list[str] = (),
) -> list[int]:
    """Feature bucket indices for one span (duplicates count twice —
    consistent on both sides of the contract).

    Families: word unigrams/bigrams, first/last word, char 3/4-grams of the
    boundary-marked lowercase surface, shape features (word count,
    capitalization pattern, digits, legal-citation cues), up to two context
    words on each side (``left``/``right``, nearest first), and the
    train-split gazetteer's label for the surface when it has one — the
    "gazetteer signal" fed to the learned model as a feature rather than a
    hard rule, so the regression decides how much to trust memorization.
    """
    toks = surface.split()
    if not toks:
        return [_h("empty", dim)]
    lowered = [t.lower() for t in toks]
    feats: list[str] = [f"nw={min(len(toks), 7)}"]
    for w in lowered:
        feats.append("w=" + w)
    for a, b in zip(lowered, lowered[1:]):
        feats.append(f"b={a}_{b}")
    feats.append("fw=" + lowered[0])
    feats.append("lw=" + lowered[-1])
    joined = "^" + " ".join(lowered) + "$"
    for n in (3, 4):
        for i in range(len(joined) - n + 1):
            feats.append(f"c{n}={joined[i:i + n]}")
    # shape: per-word capitalization / digit pattern, capped at 7 words
    shape = []
    for t in toks[:7]:
        if t.isupper():
            shape.append("A")
        elif t[:1].isupper():
            shape.append("C")
        elif any(ch.isdigit() for ch in t):
            shape.append("9")
        else:
            shape.append("a")
    feats.append("shape=" + "".join(shape))
    if any(ch.isdigit() for ch in surface):
        feats.append("hasdigit")
    if "v." in lowered or "vs." in lowered or "versus" in lowered:
        feats.append("vscue")
    if surface[:1].isupper():
        feats.append("initcap")
    for i, w in enumerate(left[:2]):
        feats.append(f"l{i + 1}={w.lower()}")
    for i, w in enumerate(right[:2]):
        feats.append(f"r{i + 1}={w.lower()}")
    if gaz_label is not None:
        feats.append("gaz=" + gaz_label)
        feats.append("gazhit")
    feats.extend(extra)
    return [_h(f, dim) for f in feats]


def derive_word_labels(entries: dict[str, str]) -> dict[str, tuple[str, ...]]:
    """Gazetteer entry surfaces -> per-word label sets: which entity types
    has each individual word been seen inside? Deterministically derived
    from the entries dict shipped in the artifact (sorted label tuples), so
    trainer and backend always agree without storing a second table."""
    acc: dict[str, set[str]] = {}
    for surf, label in entries.items():
        for w in surf.split(" "):
            acc.setdefault(w, set()).add(label)
    return {w: tuple(sorted(ls)) for w, ls in acc.items()}


def gazetteer_word_features(
    lowered_words: list[str], word_labels: dict[str, tuple[str, ...]]
) -> list[str]:
    """Partial-match gazetteer signals: full-span hits are rare across
    documents (17% on the LegalNER split), but individual words recur —
    surnames, court names, statute words. Emits the label sets of the first
    word, last word, and (when every word has been seen under one shared
    label) an all-words feature."""
    out = []
    for lb in word_labels.get(lowered_words[0], ()):
        out.append("gwf=" + lb)
    for lb in word_labels.get(lowered_words[-1], ()):
        out.append("gwl=" + lb)
    shared: set[str] | None = None
    for w in lowered_words:
        ls = word_labels.get(w)
        if ls is None:
            shared = None
            break
        shared = set(ls) if shared is None else shared & set(ls)
        if not shared:
            break
    if shared:
        for lb in sorted(shared):
            out.append("gwa=" + lb)
    return out


def word_shape(t: str) -> str:
    if t.isupper():
        return "A"
    if t[:1].isupper():
        return "C"
    if any(ch.isdigit() for ch in t):
        return "9"
    return "a"


def token_feature_indices(
    words: list[str],
    lowered: list[str],
    i: int,
    gaz_types: list[str],
    word_labels: dict[str, tuple[str, ...]],
    dim: int = DEFAULT_DIM,
) -> list[int]:
    """Feature bucket indices for token ``i`` of a sentence — the
    token-classification twin of ``span_feature_indices`` (reference path:
    AutoModelForTokenClassification, legal_ner/inference.py:47-55).

    ``gaz_types`` is the per-token type from the train gazetteer's greedy
    longest match (GazetteerTokenScorer.predict_types) — memorization as a
    feature, not a rule. ``word_labels`` marks types each word has appeared
    inside. Context: word identity at offsets -3..3, shapes at -2..2.
    """
    n = len(words)
    t, low = words[i], lowered[i]
    feats = [
        "bias",
        "w=" + low,
        "shape=" + word_shape(t),
        "pfx2=" + low[:2],
        "pfx3=" + low[:3],
        "sfx2=" + low[-2:],
        "sfx3=" + low[-3:],
        "sfx4=" + low[-4:],
    ]
    if any(ch.isdigit() for ch in t):
        feats.append("hasdigit")
    if "." in t:
        feats.append("hasdot")
    for off in (-3, -2, -1, 1, 2, 3):
        j = i + off
        feats.append(f"w{off}=" + (lowered[j] if 0 <= j < n else ("<s>" if j < 0 else "</s>")))
    for off in (-2, -1, 1, 2):
        j = i + off
        feats.append(f"s{off}=" + (word_shape(words[j]) if 0 <= j < n else "#"))
    if gaz_types[i] != "O":
        feats.append("gazt=" + gaz_types[i])
        prev = gaz_types[i - 1] if i > 0 else "O"
        feats.append("gazb" if prev != gaz_types[i] else "gazi")
    for lb in word_labels.get(low, ()):
        feats.append("gw=" + lb)
    return [_h(f, dim) for f in feats]


def span_context(words: list[str], s: int, e: int) -> tuple[tuple[str, ...], tuple[str, ...]]:
    """(left, right) context tuples for span [s, e) — nearest word first,
    ``<s>``/``</s>`` sentinels at the edges."""
    left = tuple(words[s - 1 - i] if s - 1 - i >= 0 else "<s>" for i in range(2))
    right = tuple(words[e + i] if e + i < len(words) else "</s>" for i in range(2))
    return left, right
