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

**Engine-portable twin** (``feature_hash="md5"`` — the
`text_quality_model_portable` oracle gate, round 11): grams hash via
``int(md5(gram)[:15], 16) % dim`` (the repo's cross-engine hash idiom:
Spark ``conv(substring(md5(g),1,15),16,10)``, DuckDB
``('0x'||substring(md5(g),1,15))::BIGINT``), tokens are explicit-ASCII
``[A-Za-z0-9_]+`` (Python ``\\w`` is Unicode; Java/RE2 ``\\w`` is
ASCII — spelling it out makes all three engines agree), the gradient
applies per-unique-feature as ``(lr·g)·(cnt/n)`` (one multiply — the
exact expression a SQL engine evaluates — instead of siphash's
per-occurrence ``np.add.at`` fold), and scoring compiles to a pure
DataFrame projection (higher-order ``aggregate`` fold over the
DISTINCT grams, weighted by occurrence count, against an inlined
weight-array literal — zero shuffle, zero Python) so the whole
pipeline is replayable in ANSI-ish SQL. Both paths are the same SGD —
sample order, per-example updates, epochs, calibrated threshold."""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
# portable twin tokenizer: explicit ASCII class so Python, Java
# (Spark regexp_extract_all) and RE2 (DuckDB) tokenize identically
_ASCII_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
PORTABLE_TOKEN_PATTERN = "[A-Za-z0-9_]+"


def _md5_feature_counts(text: str, dim: int):
    """Portable featurization: {md5-hashed gram id → count} plus the
    total gram count. The hash is the cross-engine idiom
    ``int(md5(gram)[:15], 16) % dim`` (15 hex chars < 2^60 — never
    overflows a signed 64-bit int in any engine)."""
    import hashlib

    toks = _ASCII_TOKEN_RE.findall((text or "").lower())
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    counts: dict[int, int] = {}
    for g in grams:
        fid = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % dim
        counts[fid] = counts.get(fid, 0) + 1
    return counts, len(grams)


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


def _portable_score_one(uf, cnts, n, w: np.ndarray, b: float) -> float:
    """Sigmoid score for one pre-featurized doc under the md5 twin's
    aggregated arithmetic (mirrors the SQL oracle's SUM(wt*cnt)/n)."""
    z = (float((w[uf] * cnts).sum()) / n + b) if n else b
    return 1.0 / (1.0 + np.exp(-z))


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
    feature_hash: str = "sip",
    order_hash: str = "xxhash64",
) -> dict:
    """Fit the classifier on a bounded deterministic hash-sample
    (smallest ``order_hash(id)`` — ONE TakeOrdered job, same sampling
    as bpe_train/kmeans_fit). ``label_col`` holds 0/1 quality labels —
    in practice heuristic keep flags (gopher_rules), a labeled seed
    set, or "is it Wikipedia" positives per the GPT-3 recipe.

    ``feature_hash``: "sip" (default — pandas siphash featurization,
    per-occurrence ``np.add.at`` updates, the production path) or
    "md5" (the engine-portable twin: md5-hashed ASCII grams,
    per-unique-feature ``(lr·g)·(cnt/n)`` updates — the arithmetic a
    SQL oracle evaluates verbatim; see module docstring).
    ``order_hash``: "xxhash64" or "md5" (portable sample ordering, as
    in kmeans_fit/pq_train).

    Returns {"w": float32[dim] (float64 for md5 — the oracle replays
    exact doubles), "b", "dim", "threshold", "feature_hash"} —
    broadcast-small at any supported dim."""
    if feature_hash not in ("sip", "md5"):
        raise ValueError(f"feature_hash must be sip|md5: {feature_hash!r}")
    if order_hash == "md5":
        key = F.md5(F.col("id").cast("string"))
    elif order_hash == "xxhash64":
        key = F.xxhash64(F.col("id"))
    else:
        raise ValueError(f"order_hash must be xxhash64|md5: {order_hash!r}")
    rows = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("t"),
            F.col(label_col).cast("double").alias("y"),
        )
        .filter(F.col(label_col).isNotNull())
        .orderBy(key, F.col("id"))
        .limit(sample_limit)
        .collect()
    )
    if not rows:
        raise ValueError("quality_train: no labeled rows to train on")
    ys = np.array([r.y for r in rows])
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    if feature_hash == "md5":
        mfeats = [_md5_feature_counts(r.t, dim) for r in rows]
        packed = [
            (
                np.array(sorted(c), dtype=np.int64),
                np.array([c[f] for f in sorted(c)], dtype=np.float64),
                n,
            )
            for c, n in mfeats
        ]
        for _ in range(epochs):
            for (uf, cnts, n), y in zip(packed, ys):
                if n:
                    z = float((w[uf] * cnts).sum()) / n + b
                else:
                    z = b
                p = 1.0 / (1.0 + np.exp(-z))
                g = p - y
                b -= lr * g
                if n:
                    # ONE rounding per feature — the exact expression
                    # the DuckDB oracle computes (not an np.add.at
                    # per-occurrence fold, whose cnt sequential adds
                    # round differently)
                    w[uf] -= (lr * g) * (cnts / n)
            if l2:
                w *= 1.0 - lr * l2
        scores = np.array([
            _portable_score_one(uf, cnts, n, w, b)
            for uf, cnts, n in packed
        ])
    else:
        feats = [_doc_feature_ids(r.t, dim) for r in rows]
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
        scores = _score_texts([r.t for r in rows], w, b, dim)
    # decision threshold: the train-sample midpoint that maximizes
    # accuracy (deterministic — ties resolve to the smallest midpoint).
    # A fixed 0.5 is miscalibrated whenever classes are imbalanced or
    # the separating signal is weak; picking it on the sample is the
    # standard classifier-calibration step and costs O(n log n).
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
        # the md5 twin keeps float64: the SQL oracle replays exact
        # doubles, and its sparse join ships only the touched slots
        "w": w if feature_hash == "md5" else w.astype(np.float32),
        "b": float(b),
        "dim": int(dim),
        "threshold": best_thr,
        "feature_hash": feature_hash,
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

    - sip models (production): one Arrow-batched map pass, weights
      shipped by closure (broadcast-small); adds NO shuffle — the
      plan is scan → mapInPandas.
    - md5 models (the portable twin): compiles to ONE codegen
      projection — tokenize, gram list, higher-order fold against the
      inlined weight-array literal — no Python on the executors, no
      shuffle, no join (see _quality_score_md5)."""
    import pandas as pd

    if model.get("feature_hash") == "md5":
        return _quality_score_md5(df, model, text_col, threshold)
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


def _quality_score_md5(
    df: DataFrame,
    model: dict,
    text_col: str,
    threshold: float | None,
) -> DataFrame:
    """Portable-twin scorer: the WHOLE score is one codegen'd
    projection — tokenize (JVM regex), build the unigram+bigram list,
    fold ``Σ w[md5(g) % dim] · cnt(g)`` over the DISTINCT grams
    against an INLINED weight-array literal (the hyperplane-LSH
    portable precedent: model state as SQL literals), tf-normalize,
    sigmoid. The per-UNIQUE-gram ``w·cnt`` form matches the trainer's
    calibration arithmetic and the oracle's SUM(wt·cnt)/n term for
    term (a per-occurrence fold would re-round cnt sequential adds —
    the divergence the trainer's own update comment forbids); the
    occurrence count is a nested filter over the gram list, O(g·u)
    comparisons per doc inside codegen. Zero shuffle, zero joins,
    zero Python on executors — the plan is scan → project, asserted
    in tests. The array literal bounds ``dim``: the twin exists for
    engine-portable oracle gates at small dim; production scoring at
    2^17 stays on the sip path. NULL text scores at the bias, same
    as the trainer's ``text or ""`` and the oracle's no-gram leg."""
    w = np.asarray(model["w"], dtype=np.float64)
    b = float(model["b"])
    dim = int(model["dim"])
    if dim > (1 << 13):
        raise ValueError(
            f"md5-twin scoring inlines the {dim}-slot weight array as "
            "a literal; use dim <= 8192 or feature_hash='sip'"
        )
    if threshold is None:
        threshold = float(model.get("threshold", 0.5))
    warr = F.array(*[F.lit(float(x)) for x in w])
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit(PORTABLE_TOKEN_PATTERN),
        F.lit(0),
    )
    grams = F.when(F.size(toks) < 2, toks).otherwise(
        F.concat(
            toks,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat(
                    F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
                ),
            ),
        )
    )
    # md5(gram) → 15 hex chars → BIGINT → % dim: the cross-engine hash
    # (DuckDB: ('0x'||substring(md5(g),1,15))::BIGINT % dim; trainer:
    # int(hexdigest()[:15], 16) % dim) — 60 bits, never negative.
    # The fid list materializes ONCE (one md5 pass per occurrence);
    # the fold then walks the distinct FIDS — colliding grams merge
    # into one w·cnt multiply, the trainer's and the oracle's exact
    # per-unique-feature form
    fids = F.transform(
        F.col("__qm_grams"),
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10)
        .cast("long") % dim,
    )
    fcol = F.col("__qm_fids")
    dot = F.aggregate(
        F.array_distinct(fcol),
        F.lit(0.0),
        lambda acc, f: acc
        + F.element_at(warr, (f + 1).cast("int"))
        * F.size(F.filter(fcol, lambda x: x == f)).cast("double"),
    )
    n = F.size(fcol)
    z = dot / F.greatest(n, F.lit(1)) + F.lit(b)
    s = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        df.withColumn("__qm_grams", grams)
        .withColumn("__qm_fids", fids)
        .withColumn("__qm_s", s)
        .withColumn("q_score", F.round("__qm_s", 6))
        .withColumn(
            "q_keep", (F.col("__qm_s") >= F.lit(threshold)).cast("long")
        )
        .drop("__qm_grams", "__qm_fids", "__qm_s")
    )
