"""Pluggable span/token scorers (SURVEY.md §2.10, §7.5).

Production backend = a transformer (LUKE/SpanMarker) loaded lazily per executor
inside an iterator pandas UDF. This sandbox has no torch, so the shipping
backend here is a **deterministic surrogate**: gazetteer matching + stable
feature hashing. The decode + metrics semantics downstream (the part
BASELINE.json measures as parity) are scorer-independent — both backends emit
the same (scores, labels) contract.

Determinism contract: no Python ``hash`` (not stable across workers —
the reference itself dodges this at legal_ner/main.py:350-353); blake2b-based
hashing, float32, fixed op order.
"""

from __future__ import annotations

import hashlib
import struct

from .spans import ENTITY_MAX_LENGTH, py_enumerate_spans


def stable_hash64(s: str) -> int:
    """Worker-stable 64-bit hash (blake2b digest prefix)."""
    return struct.unpack("<Q", hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest())[0]


def stable_unit(s: str) -> float:
    """Deterministic pseudo-uniform in [0, 1), float32-rounded."""
    import numpy as np

    return float(np.float32(stable_hash64(s) / 2.0**64))


def normalize_surface(tokens: tuple[str, ...] | list[str]) -> str:
    """Gazetteer key: lowercase, single-space-joined token run."""
    return " ".join(t.lower() for t in tokens)


def py_softmax(xs: list[float]) -> list[float]:
    """F6: numerically-stable softmax (max-shifted) — the normalization the
    reference applies to span logits before decode (legal_ner/main.py:356
    ``softmax(outputs.logits, dim=-1)``)."""
    import math

    m = max(xs)
    exps = [math.exp(x - m) for x in xs]
    s = sum(exps)
    return [e / s for e in exps]


class Gazetteer:
    """Deterministic surface -> entity-type dictionary.

    Built from annotation surfaces (e.g. the LegalNER train/dev split) —
    the surrogate's stand-in for learned weights. Ties (same surface, two
    labels) break by (count desc, label asc) for determinism.
    """

    def __init__(self, entries: dict[str, str], max_words: int = ENTITY_MAX_LENGTH):
        self.entries = entries
        self.max_words = max_words

    @classmethod
    def from_annotations(cls, rows) -> "Gazetteer":
        """rows: iterable of (surface, label)."""
        counts: dict[tuple[str, str], int] = {}
        max_words = 1
        for surface, label in rows:
            toks = (surface or "").split()
            if not toks:
                continue
            key = normalize_surface(toks)
            counts[(key, label)] = counts.get((key, label), 0) + 1
            max_words = max(max_words, len(toks))
        best: dict[str, tuple[int, str]] = {}
        for (key, label), c in counts.items():
            cur = best.get(key)
            cand = (-c, label)
            if cur is None or cand < cur:
                best[key] = cand
        return cls(
            {k: lbl for k, (_, lbl) in best.items()},
            max_words=min(max_words, ENTITY_MAX_LENGTH),
        )

    def to_broadcastable(self) -> dict:
        return {"entries": self.entries, "max_words": self.max_words}

    @classmethod
    def from_broadcastable(cls, d: dict) -> "Gazetteer":
        return cls(d["entries"], d["max_words"])


def build_word_trie(entries: dict[str, str]) -> dict:
    """Word-level trie over gazetteer surfaces: node = {word: [label_or_None,
    children]}. Shared by the token scorer (longest-match walk) and the span
    scorer's hits-only fast path."""
    root: dict = {}
    for surf, label in entries.items():
        children = root
        cell: list | None = None
        for w in surf.split(" "):
            cell = children.setdefault(w, [None, {}])
            children = cell[1]
        assert cell is not None
        cell[0] = label
    return root


class GazetteerTokenScorer:
    """Token-classification surrogate (operator M1).

    Per sentence: greedy leftmost-longest gazetteer match over the token
    sequence -> B-/I- labels; everything else "O". Mirrors the contract of
    ``AutoModelForTokenClassification`` argmax decoding
    (legal_ner/inference.py:47-50) with deterministic 'logits'.
    """

    def __init__(self, gazetteer: Gazetteer):
        self.gaz = gazetteer
        self._trie = build_word_trie(gazetteer.entries)

    def predict_types(self, tokens: list[str]) -> list[str]:
        """Entity TYPE per token (already B/I-stripped, as consumed by the
        adjacent-merge decode at inference.py:55). Longest match at each
        position, then advance past it — implemented as a single word-trie
        walk per position (the naive longest-first probe rebuilt
        O(max_words) join strings per token; the trie does dict probes
        only, and most positions die at depth 1)."""
        n = len(tokens)
        out = ["O"] * n
        lowered = [t.lower() for t in tokens]
        max_words = self.gaz.max_words
        trie = self._trie
        i = 0
        while i < n:
            node = trie
            best_len, best_label = 0, None
            e = i
            while e < n and e - i < max_words:
                nxt = node.get(lowered[e])
                if nxt is None:
                    break
                label, node = nxt
                e += 1
                if label is not None:
                    best_len, best_label = e - i, label
            if best_len:
                for j in range(i, i + best_len):
                    out[j] = best_label
                i += best_len
            else:
                i += 1
        return out


def export_numpy_model(
    gazetteer: "Gazetteer",
    label_to_idx: dict[str, int],
    path: str,
    outside_id: int = 0,
) -> str:
    """Distill a scorer into a REAL on-disk model artifact (.npz): sorted
    surface-hash keys -> (label id, hit logit). The logit is chosen so the
    softmax argmax probability equals the surrogate's hit score exactly up
    to float64 round-trip — p = 0.9 + 0.1*stable_unit(surface), logit =
    ln((K-1)p/(1-p)) with all other classes at 0 — so a pipeline run
    through the file-loading backend is decode-identical to the surrogate
    (same preds, same score ordering). This is the sandbox twin of shipping
    TorchScript weights: same lazy once-per-executor load path."""
    import math

    import numpy as np

    n_classes = max(label_to_idx.values()) + 1
    keys, labels, logits = [], [], []
    for surf, lbl in gazetteer.entries.items():
        # stable_unit is float32-rounded, so p can hit exactly 1.0 and blow
        # up the logit — clamp just below 1.
        p = min(0.9 + 0.1 * stable_unit(surf), 1.0 - 1e-9)
        keys.append(stable_hash64(surf))
        labels.append(label_to_idx.get("B-" + lbl, outside_id))
        logits.append(math.log((n_classes - 1) * p / (1.0 - p)))
    order = np.argsort(np.asarray(keys, dtype=np.uint64), kind="stable")
    np.savez(
        path,
        keys=np.asarray(keys, dtype=np.uint64)[order],
        labels=np.asarray(labels, dtype=np.int32)[order],
        logits=np.asarray(logits, dtype=np.float64)[order],
        n_classes=np.int64(n_classes),
        outside_id=np.int64(outside_id),
        # miss prob 0.5 at the outside class, like the surrogate
        miss_logit=np.float64(math.log(n_classes - 1.0)),
        max_words=np.int64(gazetteer.max_words),
    )
    return path


class NumpyLogitBackend:
    """File-loading backend for :class:`TorchSpanScorer`: surfaces ->
    logit rows from an ``export_numpy_model`` .npz. Picklable (holds only
    the path); arrays load lazily ONCE per executor process on first call —
    the exact load discipline the torch branch uses."""

    def __init__(self, path: str):
        self.path = path
        self._m = None

    def __call__(self, surfaces: list[str]) -> list[list[float]]:
        import numpy as np

        if self._m is None:
            z = np.load(self.path)
            self._m = (
                z["keys"],
                z["labels"],
                z["logits"],
                int(z["n_classes"]),
                int(z["outside_id"]),
                float(z["miss_logit"]),
            )
        keys, labels, logits, n_classes, outside_id, miss_logit = self._m
        out = []
        for s in surfaces:
            h = np.uint64(stable_hash64(normalize_surface(s.split())))
            i = int(np.searchsorted(keys, h))
            row = [0.0] * n_classes
            if i < len(keys) and keys[i] == h:
                row[int(labels[i])] = float(logits[i])
            else:
                row[outside_id] = miss_logit
            out.append(row)
        return out


class NumpyLinearBackend:
    """Backend for a TRAINED hashed-feature linear model (ner/train.py):
    (surface, context) -> logits = sum_j W[feature_j] + b. Picklable (path
    only); weights + the baked-in train-split gazetteer load lazily once per
    executor process. The featurizer version inside the artifact is asserted
    at load so train/infer can never drift silently."""

    wants_context = True

    def __init__(self, path: str):
        self.path = path
        self._m = None

    def __call__(self, surfaces: list[str], contexts=None) -> list[list[float]]:
        import json as _json

        import numpy as np

        from .features import FEATURIZER_VERSION, span_feature_indices

        if self._m is None:
            z = np.load(self.path)
            got = str(z["featurizer"])
            if got != FEATURIZER_VERSION:
                raise ValueError(
                    f"model {self.path} built with featurizer {got!r}, "
                    f"runtime has {FEATURIZER_VERSION!r}"
                )
            gaz = _json.loads(str(z["gaz_json"])) if "gaz_json" in z.files else {}
            self._m = (
                z["W"].astype(np.float32),
                z["b"].astype(np.float64),
                int(z["dim"]),
                gaz,
            )
        W, b, dim, gaz = self._m
        if contexts is None:
            contexts = [((), ())] * len(surfaces)
        idxs = []
        for s, (left, right) in zip(surfaces, contexts):
            lowered = [t.lower() for t in s.split()]
            idxs.append(
                span_feature_indices(
                    s, dim, left, right,
                    gaz.get(" ".join(lowered)) if lowered else None,
                )
            )
        starts = np.zeros(len(idxs), dtype=np.int64)
        for i in range(1, len(idxs)):
            starts[i] = starts[i - 1] + len(idxs[i - 1])
        flat = np.fromiter(
            (j for f in idxs for j in f), dtype=np.int64, count=int(starts[-1]) + len(idxs[-1])
        )
        # featurizer always emits >=1 index, so no empty reduceat segment
        sums = np.add.reduceat(W[flat], starts, axis=0) + b
        return sums.tolist()


class LinearTokenScorer:
    """TRAINED token-classification backend (ner/train.py
    ``train_legalner_token_model``): the ``predict_types`` contract of
    :class:`GazetteerTokenScorer`, so it drops into
    ``extract_mentions_token``'s adjacent-merge decode unchanged
    (inference.py:47-55 semantics: argmax tag, strip B-/I-, merge runs).

    Picklable (path only); weights + the baked-in train gazetteer load
    lazily once per executor process."""

    def __init__(self, path: str):
        self.path = path
        self._m = None

    def _load(self):
        import json as _json

        import numpy as np

        from .features import FEATURIZER_VERSION, derive_word_labels

        if self._m is None:
            z = np.load(self.path)
            got = str(z["featurizer"])
            if got != FEATURIZER_VERSION:
                raise ValueError(
                    f"model {self.path} built with featurizer {got!r}, "
                    f"runtime has {FEATURIZER_VERSION!r}"
                )
            label_to_idx = _json.loads(str(z["labels_json"]))
            gaz_entries = _json.loads(str(z["gaz_json"]))
            gaz = Gazetteer(gaz_entries, max_words=int(z["gaz_max_words"]))
            self._m = (
                z["W"].astype(np.float32),
                z["b"].astype(np.float64),
                int(z["dim"]),
                {v: k for k, v in label_to_idx.items()},
                GazetteerTokenScorer(gaz),
                derive_word_labels(gaz_entries),
            )
        return self._m

    def predict_types(self, tokens: list[str]) -> list[str]:
        import numpy as np

        from .features import token_feature_indices

        if not tokens:
            return []
        W, b, dim, idx_to_lbl, gts, word_labels = self._load()
        lowered = [t.lower() for t in tokens]
        gaz_types = gts.predict_types(tokens)
        idxs = [
            token_feature_indices(tokens, lowered, i, gaz_types, word_labels, dim)
            for i in range(len(tokens))
        ]
        starts = np.zeros(len(idxs), dtype=np.int64)
        for i in range(1, len(idxs)):
            starts[i] = starts[i - 1] + len(idxs[i - 1])
        flat = np.fromiter(
            (j for f in idxs for j in f), dtype=np.int64, count=int(starts[-1]) + len(idxs[-1])
        )
        logits = np.add.reduceat(W[flat], starts, axis=0) + b
        preds = logits.argmax(axis=1)  # first max wins, like np.argmax/reference
        out = []
        for pid in preds:
            lbl = idx_to_lbl.get(int(pid), "O")
            out.append(lbl.split("-")[-1] if lbl != "O" else "O")
        return out


class TorchSpanScorer:
    """Production span-scorer backend (SURVEY §7.0): the same
    ``score_sentence`` contract as :class:`HashedGazetteerSpanScorer`, backed
    by a TorchScript span-classification model (SpanMarker/LUKE-shaped —
    legal_ner/main.py:344-413 span scoring, inference.py:47-50 argmax).

    torch is imported lazily on first use, so the class is importable and
    broadcastable in torch-less environments (this sandbox); instantiation
    is cheap and the model loads once per executor process. ``backend`` is
    the injection seam: any callable mapping a batch of span surfaces to
    per-span logit rows — tests plug a deterministic fake through it, and
    the pipeline functions accept a ``scorer_factory`` so either backend
    drops into the same fused Arrow kernel.
    """

    def __init__(
        self,
        model_path: str | None,
        label_to_idx: dict[str, int],
        outside_id: int = 0,
        batch_size: int = 128,
        backend=None,
    ):
        self.model_path = model_path
        self.label_to_idx = label_to_idx
        self.outside_id = outside_id
        self.batch_size = batch_size
        self._backend = backend

    def _load_backend(self):
        if self._backend is None and str(self.model_path).endswith(".npz"):
            # numpy artifact: torch-free file-loading branch — same lazy
            # once-per-executor discipline, testable in this sandbox with a
            # real model file. kind="linear" (a TRAINED hashed-feature model
            # from ner/train.py) dispatches to the linear backend; the
            # gazetteer-distilled lookup table keeps the logit backend.
            import numpy as np

            with np.load(self.model_path) as z:
                is_linear = "kind" in z.files and str(z["kind"]) == "linear"
            self._backend = (
                NumpyLinearBackend(self.model_path)
                if is_linear
                else NumpyLogitBackend(self.model_path)
            )
        if self._backend is None:
            try:
                import torch
            except ImportError as exc:  # pragma: no cover - torch-less sandbox
                raise ImportError(
                    "TorchSpanScorer needs torch (pip install torch) or an "
                    "injected backend(surfaces) -> logits callable"
                ) from exc
            model = torch.jit.load(self.model_path).eval()

            def _backend(surfaces: list[str]) -> list[list[float]]:
                with torch.no_grad():
                    return model(surfaces).tolist()

            self._backend = _backend
        return self._backend

    def score_sentence(
        self, tokens: list[str], max_length: int = ENTITY_MAX_LENGTH
    ) -> tuple[list[tuple[int, int]], list[float], list[int]]:
        """Returns (spans, scores, pred_label_ids) in reference span order —
        softmax over logits, argmax class, max-prob score (first max wins on
        ties, matching np.argmax)."""
        spans = py_enumerate_spans(len(tokens), max_length)
        backend = self._load_backend()
        surfaces = [" ".join(tokens[s:e]) for s, e in spans]
        contexts = None
        if getattr(backend, "wants_context", False):
            from .features import span_context

            contexts = [span_context(tokens, s, e) for s, e in spans]
        scores: list[float] = []
        preds: list[int] = []
        for i in range(0, len(surfaces), self.batch_size):
            batch = surfaces[i : i + self.batch_size]
            rows = (
                backend(batch, contexts[i : i + self.batch_size])
                if contexts is not None
                else backend(batch)
            )
            for logits in rows:
                probs = py_softmax(list(logits))
                pid = max(range(len(probs)), key=lambda j: (probs[j], -j))
                preds.append(pid)
                scores.append(float(probs[pid]))
        return spans, scores, preds


class HashedGazetteerSpanScorer:
    """Span-scoring surrogate (operator M2, SpanMarker-shaped).

    For every enumerated span (reference order, §2.9): gazetteer hit ->
    (entity label, score in [0.9, 1.0)); miss -> (outside, score in [0.5, 0.9)).
    Scores are stable blake2b hashes of the span surface — fully deterministic
    across partitions/workers, float32 like the reference's softmax output
    (legal_ner/main.py:356).
    """

    def __init__(self, gazetteer: Gazetteer, label_to_idx: dict[str, int], outside_id: int = 0):
        self.gaz = gazetteer
        self.label_to_idx = label_to_idx
        self.outside_id = outside_id
        self._trie = build_word_trie(gazetteer.entries)

    def score_hits(
        self, tokens: list[str], max_length: int = ENTITY_MAX_LENGTH
    ) -> tuple[list[tuple[int, int]], list[float], list[int]]:
        """Fast path: ONLY gazetteer-hit spans, in reference enumeration
        order — equivalent input to the greedy decode, because (a) misses
        carry pred=outside and are skipped unconditionally, and (b) Python's
        stable sort ties equal scores by list order, which filtering
        preserves. Walks a word trie from each start instead of enumerating
        all n*max_length spans: O(n) dict probes + rare deeper walks."""
        lowered = [t.lower() for t in tokens]
        n = len(lowered)
        depth_cap = min(self.gaz.max_words, max_length)
        trie = self._trie
        spans: list[tuple[int, int]] = []
        scores: list[float] = []
        preds: list[int] = []
        for s in range(n):
            node = trie
            e = s
            while e < n and e - s < depth_cap:
                nxt = node.get(lowered[e])
                if nxt is None:
                    break
                label, node = nxt
                e += 1
                if label is not None:
                    spans.append((s, e))
                    preds.append(self.label_to_idx.get("B-" + label, self.outside_id))
                    scores.append(0.9 + 0.1 * stable_unit(" ".join(lowered[s:e])))
        return spans, scores, preds

    def score_sentence(
        self, tokens: list[str], max_length: int = ENTITY_MAX_LENGTH
    ) -> tuple[list[tuple[int, int]], list[float], list[int]]:
        """Returns (spans, scores, pred_label_ids) in reference span order.

        Hits score 0.9 + 0.1*stable_unit(surface) — hash-varied so the
        greedy decode's score-desc sort and tie-breaking are exercised.
        Misses score a constant 0.5: a miss can never be accepted by the
        decode (every hit outranks it), so hashing ~all n*max_length miss
        surfaces was pure overhead — dropping it measured ~2.5x on the
        extraction kernel. Spans longer than the gazetteer's max_words
        skip the surface join entirely (they cannot hit)."""
        spans = py_enumerate_spans(len(tokens), max_length)
        lowered = [t.lower() for t in tokens]
        entries = self.gaz.entries
        max_words = self.gaz.max_words
        outside = self.outside_id
        scores: list[float] = []
        preds: list[int] = []
        for s, e in spans:
            label = (
                entries.get(" ".join(lowered[s:e])) if e - s <= max_words else None
            )
            if label is not None:
                # B- id stands for the whole span's entity class
                preds.append(self.label_to_idx.get("B-" + label, outside))
                scores.append(0.9 + 0.1 * stable_unit(" ".join(lowered[s:e])))
            else:
                preds.append(outside)
                scores.append(0.5)
        return spans, scores, preds
