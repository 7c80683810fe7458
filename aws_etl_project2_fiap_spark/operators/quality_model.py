"""Trainable model-based quality filter — the fastText-classifier stage
of a pretraining-data pipeline (the GPT-3/LLaMA/RefinedWeb recipe:
heuristics first, then a linear classifier over hashed n-grams scores
what the rules can't articulate).

Same train/apply split as every sample-trained operator here
(bpe_train, kmeans_fit, pq_train):

- **train** is driver-side logistic regression (plain numpy SGD, no
  sklearn) on a bounded deterministic hash-sample with user-supplied
  labels — a linear model over hashed n-grams converges on thousands of
  documents, so training cost is independent of corpus size;
- **apply** is one Arrow-batched `mapInPandas` pass closing over the
  broadcast-small weight vector (dim·4 bytes ≈ 0.5 MB at the default
  2^17) — no shuffle, no row-at-a-time Python; at 100 TB the scan is
  the only cost, identical in shape to the Gopher-rules codegen pass it
  complements.

Featurization is the fastText bag: lower-cased word unigrams + bigrams,
hashed into ``dim`` buckets (pandas' stable 64-bit siphash — vectorized
and identical on driver and executors), tf-normalized so document
length doesn't dominate. Determinism: the sample is the smallest-
xxhash64 prefix, SGD order is the sample order, numpy is single-
threaded per batch — same inputs → bit-identical weights.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def _doc_feature_ids(text: str, dim: int) -> np.ndarray:
    """Hashed unigram+bigram ids for one document (may repeat —
    callers weight by count)."""
    import pandas as pd

    toks = _TOKEN_RE.findall((text or "").lower())
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not grams:
        return np.empty(0, dtype=np.int64)
    h = pd.util.hash_array(np.asarray(grams, dtype=object))
    return (h % np.uint64(dim)).astype(np.int64)


def _score_texts(texts, w: np.ndarray, b: float, dim: int) -> np.ndarray:
    """Sigmoid scores for a sequence of texts given model (w, b)."""
    out = np.empty(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        ids = _doc_feature_ids(t, dim)
        if ids.size == 0:
            z = b
        else:
            # tf-normalized bag: mean weight over (repeated) feature ids
            z = float(w[ids].sum()) / ids.size + b
        out[i] = 1.0 / (1.0 + np.exp(-z))
    return out


def quality_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 17,
    sample_limit: int = 4_000,
    epochs: int = 8,
    lr: float = 0.5,
    l2: float = 1e-6,
) -> dict:
    """Fit the classifier on a bounded deterministic hash-sample
    (smallest xxhash64(id) — ONE TakeOrdered job, same sampling as
    bpe_train/kmeans_fit). ``label_col`` holds 0/1 quality labels — in
    practice heuristic keep flags (gopher_rules), a labeled seed set,
    or "is it Wikipedia" positives per the GPT-3 recipe.

    Returns {"w": float32[dim], "b": float, "dim": dim} — ~0.5 MB at
    the default dim, safely broadcast-small."""
    rows = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("t"),
            F.col(label_col).cast("double").alias("y"),
        )
        .filter(F.col(label_col).isNotNull())
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(sample_limit)
        .collect()
    )
    if not rows:
        raise ValueError("quality_train: no labeled rows to train on")
    feats = [_doc_feature_ids(r.t, dim) for r in rows]
    ys = np.array([r.y for r in rows])
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    for _ in range(epochs):
        for ids, y in zip(feats, ys):
            if ids.size == 0:
                z = b
            else:
                z = float(w[ids].sum()) / ids.size + b
            p = 1.0 / (1.0 + np.exp(-z))
            g = p - y  # d(logloss)/dz
            b -= lr * g
            if ids.size:
                # gradient of the tf-normalized bag: g/|ids| per id
                # occurrence; np.add.at handles repeated ids exactly
                np.add.at(w, ids, -lr * (g / ids.size))
        if l2:
            w *= 1.0 - lr * l2
    # decision threshold: the train-sample midpoint that maximizes
    # accuracy (deterministic — ties resolve to the smallest midpoint).
    # A fixed 0.5 is miscalibrated whenever classes are imbalanced or
    # the separating signal is weak; picking it on the sample is the
    # standard classifier-calibration step and costs O(n log n).
    scores = _score_texts([r.t for r in rows], w, b, dim)
    order = np.argsort(scores, kind="stable")
    ss, ys_sorted = scores[order], ys[order]
    best_acc, best_thr = -1.0, 0.5
    cum_pos = np.concatenate(([0.0], np.cumsum(ys_sorted)))
    total_pos = cum_pos[-1]
    n = len(ss)
    for cut in range(n + 1):
        # predict 1 for indexes >= cut
        acc = ((cut - cum_pos[cut]) + (total_pos - cum_pos[cut])) / n
        if acc > best_acc + 1e-12:
            best_acc = acc
            if cut == 0:
                best_thr = 0.0
            elif cut == n:
                best_thr = 1.0
            else:
                best_thr = float((ss[cut - 1] + ss[cut]) / 2.0)
    return {
        "w": w.astype(np.float32),
        "b": float(b),
        "dim": int(dim),
        "threshold": best_thr,
    }


def quality_score(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    threshold: float | None = None,
) -> DataFrame:
    """Score every document with the trained classifier: appends
    ``q_score`` (sigmoid, [0,1]) and ``q_keep`` (score ≥ threshold;
    default = the train-time calibrated threshold from quality_train).
    One Arrow-batched map pass, weights shipped by closure (broadcast-
    small); adds NO shuffle — the plan is scan → mapInPandas."""
    import pandas as pd

    w = model["w"].astype(np.float64)
    b = float(model["b"])
    dim = int(model["dim"])
    if threshold is None:
        threshold = float(model.get("threshold", 0.5))
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    # NOT df.schema.add(...): StructType.add mutates in place and the
    # classic DataFrame caches its schema object, so chaining .add on it
    # corrupts df's own column list
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("q_score", DoubleType()),
            StructField("q_keep", LongType()),
        ]
    )

    # the closure must be SELF-CONTAINED (no reference to this module's
    # globals): executors receive it by cloudpickle under driver-path
    # loading where this package is not importable on workers — the
    # worker-shipping contract every Arrow closure here follows
    token_pattern = _TOKEN_RE.pattern

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re as _re

        import numpy as _np
        import pandas as _pd

        tok_re = _re.compile(token_pattern, _re.UNICODE)
        udim = _np.uint64(dim)
        for pdf in batches:
            scores = _np.empty(len(pdf), dtype=_np.float64)
            for i, t in enumerate(pdf[text_col].tolist()):
                toks = tok_re.findall((t or "").lower())
                grams = toks + [
                    f"{a} {b}" for a, b in zip(toks, toks[1:])
                ]
                if not grams:
                    z = b
                else:
                    ids = (
                        _pd.util.hash_array(
                            _np.asarray(grams, dtype=object)
                        )
                        % udim
                    ).astype(_np.int64)
                    z = float(w[ids].sum()) / ids.size + b
                scores[i] = 1.0 / (1.0 + _np.exp(-z))
            pdf = pdf.copy()
            pdf["q_score"] = _np.round(scores, 6)
            pdf["q_keep"] = (scores >= threshold).astype(_np.int64)
            yield pdf

    return df.mapInPandas(_score, out_schema)
