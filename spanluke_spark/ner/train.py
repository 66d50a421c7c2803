"""A REAL trained span scorer: hashed-feature multinomial logistic regression.

The reference trains LUKE/SpanMarker with torch (legal_ner/main.py:598-644);
this sandbox has no torch, so the learnable model family here is a convex
softmax regression over the hashed span features in ner/features.py — small,
dependency-free, fully deterministic (zero init + fixed batch order), and
shippable as a .npz that the executor-side :class:`~spanluke_spark.ner.scorer.
NumpyLinearBackend` loads lazily once per process, exactly like torch weights
would be.

Training-set construction mirrors the reference's span-classification setup
(legal_ner/main.py:344-413): every enumerated span up to ENTITY_MAX_LENGTH is
an example; exact gold word-span matches get the entity class, everything else
is O. Gold char annotations are converted to word spans with the reference's
own char->word rule (utils/convert_dataset.py:38-40). Negatives are
deterministically subsampled and importance-weighted (weight 1/keep_rate) so
the learned class priors are unbiased.

The optimizer runs on the driver: the whole LegalNER train split is ~40k
weighted examples after subsampling — a convex problem measured in MB. At
crawl scale the expensive part is featurization, which already runs
distributed (the same ``span_feature_indices`` inside the extraction kernels);
the solve itself never needs a cluster.
"""

from __future__ import annotations

import json

from .features import (
    DEFAULT_DIM,
    FEATURIZER_VERSION,
    derive_word_labels,
    span_context,
    span_feature_indices,
)
from .scorer import Gazetteer, normalize_surface, stable_hash64, stable_unit
from .spans import ENTITY_MAX_LENGTH, py_enumerate_spans


def load_legalner_docs(path: str) -> list[tuple[str, str, list[tuple[int, int, str]]]]:
    """NER_*_ALL.json (label-studio export) -> [(doc_id, text, [(start, end,
    label)])]. doc_id is the item's own stable hex id."""
    out = []
    for item in json.load(open(path)):
        text = item["data"]["text"]
        anns = [
            (r["value"]["start"], r["value"]["end"], r["value"]["labels"][0])
            for r in item["annotations"][0]["result"]
        ]
        out.append((str(item["id"]), text, anns))
    return out


def split_docs(docs, train_mod: int = 10, train_lt: int = 7):
    """Deterministic doc-level train/heldout split on the doc id hash —
    reproducible everywhere, no RNG."""
    train = [d for d in docs if stable_hash64("split|" + d[0]) % train_mod < train_lt]
    held = [d for d in docs if stable_hash64("split|" + d[0]) % train_mod >= train_lt]
    return train, held


def gold_word_spans(text: str, anns: list[tuple[int, int, str]]) -> list[tuple[int, int, str]]:
    """Char annotations -> word spans, reference semantics
    (convert_dataset.py:38-40): start = len(text[:start].split()),
    end = start + len(text[start:end].split())."""
    out = []
    for start, end, label in anns:
        ws = len(text[:start].split())
        we = ws + len(text[start:end].split())
        if we > ws:
            out.append((ws, we, label))
    return out


def train_gazetteer(docs) -> Gazetteer:
    """Gazetteer over TRAIN-split gold surfaces only (word-span snapped, the
    same normalization the inference backend applies) — the memorization
    signal the regression consumes as a feature, never a hard rule."""
    rows = []
    for _doc_id, text, anns in docs:
        words = text.split()
        for ws, we, lbl in gold_word_spans(text, anns):
            rows.append((" ".join(words[ws:we]), lbl))
    return Gazetteer.from_annotations(rows)


def build_training_rows(
    docs,
    label_to_idx: dict[str, int],
    outside_id: int,
    max_length: int = ENTITY_MAX_LENGTH,
    neg_keep: float = 0.25,
    neg_weighting: bool = True,
    dim: int = DEFAULT_DIM,
    gaz_entries: dict[str, str] | None = None,
):
    """-> (features: list[list[int]], labels: list[int], weights: list[float]).

    One example per enumerated span; negatives kept with deterministic
    probability ``neg_keep`` (hash of doc|span, no RNG). With
    ``neg_weighting`` they carry weight 1/neg_keep so expectations match the
    full objective; without it the undersampling is left uncorrected — a
    deliberate recall-tilting prior shift."""
    feats: list[list[int]] = []
    labels: list[int] = []
    weights: list[float] = []
    neg_w = 1.0 / neg_keep if neg_weighting else 1.0
    word_labels = derive_word_labels(gaz_entries) if gaz_entries else {}
    for doc_id, text, anns in docs:
        words = text.split()
        gold = {
            (ws, we): label_to_idx.get("B-" + lbl, outside_id)
            for ws, we, lbl in gold_word_spans(text, anns)
        }
        for s, e in py_enumerate_spans(len(words), max_length):
            y = gold.get((s, e))
            if y is None:
                if stable_unit(f"negsample|{doc_id}|{s}:{e}") >= neg_keep:
                    continue
                y, w = outside_id, neg_w
            else:
                w = 1.0
            left, right = span_context(words, s, e)
            lowered = [t.lower() for t in words[s:e]]
            gaz_label = gaz_entries.get(" ".join(lowered)) if gaz_entries else None
            feats.append(
                span_feature_indices(" ".join(words[s:e]), dim, left, right, gaz_label)
            )
            labels.append(y)
            weights.append(w)
    return feats, labels, weights


def train_softmax(
    feats: list[list[int]],
    labels: list[int],
    weights: list[float],
    n_classes: int,
    dim: int = DEFAULT_DIM,
    epochs: int = 60,
    batch_size: int = 4096,
    lr: float = 0.05,
    l2: float = 1e-6,
):
    """Weighted softmax cross-entropy via Adam on an embedding-sum linear
    model (logit = sum_j W[idx_j] + b). Deterministic: zero init, fixed
    example order, float32. Returns (W: dim x K float32, b: K float64).

    Examples are ragged (feature counts vary ~10-400), so both passes work
    on the flat index array: forward = gather + ``add.reduceat`` segment
    sum; backward = per-class ``bincount`` with per-example ``repeat``
    weights — no padding, no ``np.add.at``."""
    import numpy as np

    n = len(feats)
    counts = np.asarray([len(f) for f in feats], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    flat_all = np.fromiter(
        (j for f in feats for j in f), dtype=np.int64, count=int(offsets[-1])
    )
    y = np.asarray(labels, dtype=np.int64)
    w = np.asarray(weights, dtype=np.float32)

    W = np.zeros((dim, n_classes), dtype=np.float32)
    b = np.zeros(n_classes, dtype=np.float32)
    mW = np.zeros_like(W)
    vW = np.zeros_like(W)
    mb = np.zeros_like(b)
    vb = np.zeros_like(b)
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    t = 0
    for _epoch in range(epochs):
        for lo in range(0, n, batch_size):
            hi = min(lo + batch_size, n)
            fl = flat_all[offsets[lo] : offsets[hi]]
            starts = offsets[lo:hi] - offsets[lo]
            by = y[lo:hi]
            bw = w[lo:hi]
            bc = counts[lo:hi]
            # every example has >=1 feature, so no empty reduceat segment
            logits = np.add.reduceat(W[fl], starts, axis=0) + b  # (B, K)
            logits -= logits.max(axis=1, keepdims=True)
            p = np.exp(logits)
            p /= p.sum(axis=1, keepdims=True)
            g = p  # (B, K) = p - onehot(y), weighted
            g[np.arange(hi - lo), by] -= 1.0
            g *= bw[:, None] / bw.sum()
            gW = np.empty_like(W)
            for k in range(n_classes):
                gW[:, k] = np.bincount(fl, weights=np.repeat(g[:, k], bc), minlength=dim)
            gW += l2 * W
            gb = g.sum(axis=0)
            t += 1
            corr1 = 1.0 - beta1**t
            corr2 = 1.0 - beta2**t
            for p_, m_, v_, g_ in ((W, mW, vW, gW), (b, mb, vb, gb)):
                m_ *= beta1
                m_ += (1 - beta1) * g_
                v_ *= beta2
                v_ += (1 - beta2) * g_**2
                p_ -= lr * (m_ / corr1) / (np.sqrt(v_ / corr2) + eps)
    return W, b.astype(np.float64)


def export_linear_model(
    W,
    b,
    path: str,
    label_to_idx: dict[str, int],
    outside_id: int,
    dim: int = DEFAULT_DIM,
    gaz_entries: dict[str, str] | None = None,
) -> str:
    """Ship the trained weights as the .npz artifact NumpyLinearBackend
    loads — self-contained: weights + the train-split gazetteer the
    featurizer consults. float16 storage halves the repo footprint; compute
    is float32."""
    import numpy as np

    np.savez_compressed(
        path,
        kind=np.str_("linear"),
        featurizer=np.str_(FEATURIZER_VERSION),
        W=np.asarray(W, dtype=np.float16),
        b=np.asarray(b, dtype=np.float64),
        dim=np.int64(dim),
        n_classes=np.int64(W.shape[1]),
        outside_id=np.int64(outside_id),
        labels_json=np.str_(json.dumps(label_to_idx)),
        gaz_json=np.str_(json.dumps(gaz_entries or {})),
    )
    return path


def bio_tags(num_words: int, word_spans: list[tuple[int, int, str]]) -> list[str]:
    """Word spans -> per-token BIO tags (later annotations overwrite earlier,
    matching convert_dataset.py:40's slice-assignment semantics)."""
    tags = ["O"] * num_words
    for ws, we, lbl in word_spans:
        if ws >= num_words:
            continue
        we = min(we, num_words)
        tags[ws] = "B-" + lbl
        for i in range(ws + 1, we):
            tags[i] = "I-" + lbl
    return tags


def build_token_training_rows(
    docs,
    label_to_idx: dict[str, int],
    outside_id: int,
    gaz: Gazetteer,
    dim: int = DEFAULT_DIM,
):
    """Token-classification training set: one example per token, BIO label
    ids, no subsampling (the O class is learned, not undersampled). The
    train gazetteer's greedy longest-match types ride along as features."""
    from .features import token_feature_indices
    from .scorer import GazetteerTokenScorer

    gts = GazetteerTokenScorer(gaz)
    word_labels = derive_word_labels(gaz.entries)
    feats: list[list[int]] = []
    labels: list[int] = []
    for _doc_id, text, anns in docs:
        words = text.split()
        if not words:
            continue
        lowered = [t.lower() for t in words]
        tags = bio_tags(len(words), gold_word_spans(text, anns))
        gaz_types = gts.predict_types(words)
        for i in range(len(words)):
            feats.append(
                token_feature_indices(words, lowered, i, gaz_types, word_labels, dim)
            )
            labels.append(label_to_idx.get(tags[i], outside_id))
    return feats, labels, [1.0] * len(feats)


def train_legalner_token_model(
    docs,
    label_to_idx: dict[str, int],
    outside_id: int,
    path: str,
    dim: int = DEFAULT_DIM,
    epochs: int = 30,
    batch_size: int = 4096,
    lr: float = 0.05,
    l2: float = 1e-6,
) -> str:
    """End-to-end token-path trainer: docs -> gazetteer -> per-token rows ->
    trained weights -> self-contained .npz (kind="token-linear") for
    :class:`~spanluke_spark.ner.scorer.LinearTokenScorer`."""
    import numpy as np

    gaz = train_gazetteer(docs)
    feats, labels, weights = build_token_training_rows(
        docs, label_to_idx, outside_id, gaz, dim=dim
    )
    W, b = train_softmax(
        feats, labels, weights,
        n_classes=max(label_to_idx.values()) + 1, dim=dim,
        epochs=epochs, batch_size=batch_size, lr=lr, l2=l2,
    )
    np.savez_compressed(
        path,
        kind=np.str_("token-linear"),
        featurizer=np.str_(FEATURIZER_VERSION),
        W=np.asarray(W, dtype=np.float16),
        b=np.asarray(b, dtype=np.float64),
        dim=np.int64(dim),
        n_classes=np.int64(W.shape[1]),
        outside_id=np.int64(outside_id),
        labels_json=np.str_(json.dumps(label_to_idx)),
        gaz_json=np.str_(json.dumps(gaz.entries)),
        gaz_max_words=np.int64(gaz.max_words),
    )
    return path


def train_legalner_span_model(
    docs,
    label_to_idx: dict[str, int],
    outside_id: int,
    path: str,
    dim: int = DEFAULT_DIM,
    **kwargs,
) -> str:
    """End-to-end: docs -> gazetteer -> training rows -> trained weights ->
    self-contained .npz."""
    gaz = train_gazetteer(docs)
    feats, labels, weights = build_training_rows(
        docs, label_to_idx, outside_id, dim=dim, gaz_entries=gaz.entries,
        **{k: v for k, v in kwargs.items() if k in ("max_length", "neg_keep", "neg_weighting")},
    )
    W, b = train_softmax(
        feats, labels, weights,
        n_classes=max(label_to_idx.values()) + 1, dim=dim,
        **{k: v for k, v in kwargs.items() if k in ("epochs", "batch_size", "lr", "l2")},
    )
    return export_linear_model(
        W, b, path, label_to_idx, outside_id, dim=dim, gaz_entries=gaz.entries
    )
