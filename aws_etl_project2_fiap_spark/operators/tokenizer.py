"""Trainable BPE tokenizer — corpus-exact token accounting for a
training-data pipeline.

`operators/text.py`'s regex token counter is the cheap estimator; this
module is the real thing: byte-pair-encoding merges TRAINED on the
corpus, applied distributed. The shape mirrors every other
sample-trained operator here (kmeans_fit, pq_train):

- **train** is driver-side on a bounded deterministic hash-sample —
  merge quality converges on a sample long before the corpus does, so
  training is O(sample · vocab_size), independent of table size;
- **apply** is one Arrow-batched pass (`mapInPandas`) closing over the
  broadcast-small merge ranks — no shuffle, no Python-row fallback;
  the scan stays the only cost at 100 TB.

The algorithm is the published BPE (Sennrich et al. 2016; the GPT-2
variant's rank-greedy application): words split to symbol sequences
with an end-of-word marker, the most frequent adjacent pair merges,
repeat to vocab budget; encoding replays merges in rank order. The
invariant tests assert: determinism, lossless-ness (concatenating a
word's tokens reproduces the word), and agreement with a pure-Python
reference implementation.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "\x01"  # end-of-word sentinel (never matched by the word regex)
_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
# engine-portable word regex (the text_bpe_tokens_portable gate):
# every character class spelled out in ASCII so Python re (Unicode
# \w/\s) and RE2 (ASCII \w, \s without \v) tokenize identically on
# ANY input, not just ASCII corpora (review r11)
PORTABLE_WORD_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r\f\v]"


def _word_freqs(texts, word_re=None) -> dict[str, int]:
    freqs: dict[str, int] = {}
    rx = word_re or _WORD_RE
    for t in texts:
        for w in rx.findall(t or ""):
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 200,
    sample_limit: int = 2_000,
    order_hash: str = "xxhash64",
    word_pattern: str | None = None,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a bounded hash-sample of
    the corpus (same deterministic sampling as kmeans_fit: smallest
    ``order_hash(id)``, ONE TakeOrdered job). Returns the ordered
    merge list — rank i = the i-th most frequent pair at its merge
    time. ``order_hash``: "xxhash64" (default) or "md5" (engine-
    portable sample ordering — the `text_bpe_tokens_portable` oracle
    gate; BPE itself is pure integer/string arithmetic, so given the
    same sample a SQL engine replays training bit-for-bit).
    ``word_pattern`` overrides the Unicode word regex — the portable
    gate passes :data:`PORTABLE_WORD_PATTERN` so tokenization matches
    RE2 byte for byte.

    Ties break lexicographically, so training is bit-deterministic
    across runs and partitionings."""
    word_re = re.compile(word_pattern) if word_pattern else _WORD_RE
    if order_hash == "md5":
        key = F.md5(F.col("id").cast("string"))
    elif order_hash == "xxhash64":
        key = F.xxhash64(F.col("id"))
    else:
        raise ValueError(f"order_hash must be xxhash64|md5: {order_hash!r}")
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .orderBy(key, F.col("id"))
        .limit(sample_limit)
        .collect()
    )
    freqs = _word_freqs([r.t for r in rows], word_re)
    words = {w: tuple(w) + (_EOW,) for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, sym in words.items():
            f = freqs[w]
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break  # merging hapax pairs just memorizes the sample
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        out = {}
        for w, sym in words.items():
            new = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            out[w] = tuple(new)
        words = out
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy BPE application to one word (the GPT-2 encode loop):
    repeatedly merge the LOWEST-RANK adjacent pair present."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    with_tokens: bool = False,
    word_pattern: str | None = None,
) -> DataFrame:
    """Distributed encode: (id, n_tokens[, tokens]) in ONE Arrow pass.
    The merge ranks close over the UDF (merges ≪ corpus — a vocabulary
    is kilobytes); per-word results memoize within each batch, so hot
    words (Zipf) encode once per batch, not once per occurrence.
    ``word_pattern`` must match what the merges were TRAINED with —
    the portable gate passes :data:`PORTABLE_WORD_PATTERN` to both."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = "id long, n_tokens long" + (
        ", tokens array<string>" if with_tokens else ""
    )
    # the closure must be SELF-CONTAINED (no reference to this module's
    # globals): executors receive it by cloudpickle under driver-path
    # loading where this package is not importable on workers — the
    # worker-shipping contract every Arrow closure here follows
    word_pattern, eow = word_pattern or _WORD_RE.pattern, _EOW

    def _encode(it):
        import re as _re

        import pandas as pd

        word_re = _re.compile(word_pattern, _re.UNICODE)
        cache: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = cache.get(word)
            if got is not None:
                return got
            sym = list(word) + [eow]
            while len(sym) > 1:
                best_rank = None
                best_i = -1
                for i in range(len(sym) - 1):
                    r = ranks.get((sym[i], sym[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
            cache[word] = sym
            return sym

        for pdf in it:
            counts, toks = [], []
            for t in pdf["t"]:
                out: list[str] = []
                for w in word_re.findall(t or ""):
                    out.extend(enc(w))
                counts.append(len(out))
                if with_tokens:
                    toks.append([s.replace(eow, "") for s in out])
            data = {"id": pdf["id"].values, "n_tokens": counts}
            if with_tokens:
                data["tokens"] = toks
            yield pd.DataFrame(data)

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    return src.mapInPandas(_encode, schema)
