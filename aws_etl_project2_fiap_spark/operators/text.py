"""Text-analysis operators for LLM training-data pipelines.

All hot-path expressions are JVM built-ins (regexp/length/split — whole-
stage codegen), no Python UDFs: these run over every document at 100 TB,
so staying inside Tungsten matters more than anywhere else.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length / punctuation / stopword ratios), language ID (stopword-marker
n-gram heuristic), document fingerprinting (rolling/content hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the heuristic language ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "zh": ["zh", "zhong", "wen"],
}

# a BPE-ish tokenizer regex: words, numbers, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(col: Column | str) -> Column:
    """Whitespace token count. ``split`` on ``\\s+`` after trim; empty
    string → 0 tokens."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count via regexp extraction (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0)))


def word_tokens(col: Column | str) -> Column:
    """Lowercased alphanumeric word tokens (codegen split + filter).

    The canonical tokenizer for n-gram ops (dedup shingles use their own
    shingle tokenizer; this one is for decontamination / repetition
    stats): lowercase, split on non-alphanumeric runs, drop empties."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != F.lit(""))


def word_ngrams(tokens: Column, n: int) -> Column:
    """Space-joined word ``n``-grams over a token array.

    Empty array when fewer than ``n`` tokens — the guard matters because
    ``sequence(1, k)`` with ``k < 1`` would generate a DESCENDING range,
    not an empty one. Pure JVM array expressions (no explode here, so the
    caller chooses between array ops and relational explode)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.array_join(F.slice(tokens, i, n), " "),
    )
    return F.when(F.size(tokens) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def marker_hits(col: Column | str, word: str) -> Column:
    """Occurrences of ``word`` as a whole word (``\\b``-bounded count).

    ``regexp_count`` counts overlapping-adjacent occurrences correctly —
    the earlier space-padded replace() trick undercounted runs like
    "the the the" (adjacent needles share their delimiter space)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(rf"\b{word}\b")).cast("long")


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit totals (the n-gram heuristic)."""
    return {
        lang: sum(marker_hits(col, w) for w in words).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    }


def predict_lang(col: Column | str) -> Column:
    """argmax over lang_scores, ties broken by language-code order;
    all-zero → 'und'."""
    scores = lang_scores(col)
    best = None
    best_score = None
    for lang in sorted(scores):  # deterministic tie order
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    total = sum(scores[lang] for lang in scores)
    return F.when(total == 0, F.lit("und")).otherwise(best)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: char/token counts, mean token length,
    punctuation ratio, stopword ratio — all codegen'd expressions."""
    c = F.col(text_col)
    n_char = F.length(c)
    n_tok = token_count(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    stop_hits = sum(marker_hits(c, w) for w in LANG_MARKERS["en"])
    return df.select(
        *df.columns,
        n_char.alias("n_char"),
        n_tok.alias("n_tok"),
        (n_char / F.greatest(n_tok, F.lit(1))).alias("mean_tok_len"),
        (n_punct / F.greatest(n_char, F.lit(1))).alias("punct_ratio"),
        (stop_hits / F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    RAG / context-window chunking shape. Chunk i covers tokens
    ``[i·stride, i·stride + chunk_tokens)`` with ``stride =
    chunk_tokens − overlap``; consecutive chunks share ``overlap``
    tokens; every token lands in ≥1 chunk; the final chunk may be short
    but always contributes ≥1 new token (``n_chunks =
    max(ceil((n − overlap)/stride), 1)``).

    Pure codegen: one projection builds the token array, a
    ``transform(sequence(...))`` slices the windows into
    (text, n_tokens) structs, ``posexplode`` emits
    (id, chunk_idx, chunk_text, n_chunk_tokens). No shuffle, no UDF —
    at 100 TB this fuses into the scan and the output is written
    straight back out, which is exactly how corpus chunking must run.
    The token count rides the slice itself (its length IS the count,
    r10) — the earlier re-split of the joined chunk text cost a second
    regex pass over every output byte, ~25% of the sf1 wall-clock."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    tk = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )
    pre = df.select(F.col(id_col), tk.alias("__tk"))
    n_chunks = F.greatest(
        F.ceil((F.size("__tk") - F.lit(overlap)) / F.lit(float(stride))),
        F.lit(1),
    ).cast("int")

    def window(i):
        sl = F.slice("__tk", i * stride + 1, chunk_tokens)
        return F.struct(
            F.concat_ws(" ", sl).alias("t"),
            F.size(sl).cast("long").alias("n"),
        )

    windows = F.transform(F.sequence(F.lit(0), n_chunks - 1), window)
    return (
        pre.select(id_col, F.posexplode(windows).alias("chunk_idx", "__c"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("__c.t").alias("chunk_text"),
            F.col("__c.n").alias("n_chunk_tokens"),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Document-level quality gate with the published Gopher/RefinedWeb
    repetition-free heuristics (Rae et al. 2021 §A1.1; Penedo et al.
    2023): word-count bounds, mean-word-length band, symbol-to-word
    ratio (#/ellipsis), bullet-start and ellipsis-end line ratios,
    alphabetic-word fraction, and stopword presence. One codegen'd
    projection — no UDFs, no shuffle; at 100 TB this is a map-only pass
    that fuses into the scan, exactly how a pretraining-corpus filter
    must run.

    Returns the id column + the measured features + ``keep``
    (1 = passes every rule). Thresholds are the published defaults;
    override per-corpus."""
    c = F.col(text_col)
    wds = F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(wds)
    nw = F.greatest(n_words, F.lit(1))
    mean_wl = F.length(F.regexp_replace(c, r"\s+", "")) / nw
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell3 = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / 3
    n_ellu = F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit("")))
    symbol_ratio = (n_hash + n_ell3 + n_ellu) / nw
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_ratio = (
        F.size(F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[-*•]")))
        / n_lines
    )
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")))
        / n_lines
    )
    alpha_ratio = F.size(F.filter(wds, lambda w: w.rlike("[A-Za-z]"))) / nw
    n_stop = sum(
        F.array_contains(wds, w).cast("long") for w in GOPHER_STOPWORDS
    )
    out = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_line_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        n_stop.alias("n_stopwords"),
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") < max_symbol_ratio)
        & (F.col("bullet_ratio") < max_bullet_ratio)
        & (F.col("ellipsis_line_ratio") < max_ellipsis_ratio)
        & (F.col("alpha_word_ratio") > min_alpha_ratio)
        & (F.col("n_stopwords") >= min_stopwords)
    )
    return out.withColumn("keep", keep.cast("long"))


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: xxhash64 of the whitespace-normalized text —
    one 64-bit key for exact-dup detection at scale (cheaper to shuffle
    than md5 strings)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.regexp_replace(F.trim(c), r"\s+", " "))


def rolling_chunk_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    mask_bits: int = 5,
) -> DataFrame:
    """Content-defined chunking via a Rabin-style rolling hash:
    (id, chunk_hash) rows, one per chunk.

    A fixed-width polynomial rolling hash slides over the bytes; byte
    positions where ``hash % 2^mask_bits == 0`` become chunk boundaries,
    so boundaries follow CONTENT, not offsets — insert one word at the
    front of a doc and every fixed-size shingle shifts, but rolling
    chunks realign after one boundary. Chunk hashes therefore support
    shift-tolerant dedup/delta detection (rsync/LBFS lineage).

    Arrow-batched numpy (vectorized polynomial evaluation per doc);
    output is a narrow (id, hash) table — groupBy/join it like any
    fingerprint table. Expected chunk length = 2^mask_bits bytes.
    """
    import numpy as np
    import pandas as pd

    # modulus small enough that a window-dot-product fits int64:
    # window * 255 * mod ~ 2^43 << 2^63
    base, mod = 257, (1 << 31) - 1
    mask = (1 << mask_bits) - 1

    def _chunks(batches):
        # kernel[j] = base^(window-1-j) mod m -> hash_i = window_i . kernel
        kernel = np.array(
            [pow(base, window - 1 - j, mod) for j in range(window)], dtype=np.int64
        )
        for pdf in batches:
            out_id, out_hash = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                data = np.frombuffer(
                    (text or "").encode("utf-8", "ignore"), dtype=np.uint8
                ).astype(np.int64)
                if len(data) < window:
                    if len(data):
                        out_id.append(doc_id)
                        out_hash.append(int(data.sum()))
                    continue
                # all positions' rolling hashes in one matmul
                sw = np.lib.stride_tricks.sliding_window_view(data, window)
                hashes = (sw @ kernel) % mod
                bounds = np.nonzero((hashes & mask) == 0)[0].tolist()
                prev = 0
                for b in [*bounds, len(data)]:
                    if b <= prev:
                        continue
                    seg = data[prev:b]
                    out_id.append(doc_id)
                    out_hash.append(int((seg * (np.arange(len(seg)) + 1)).sum() % mod))
                    prev = b
            yield pd.DataFrame({"id": out_id, "chunk_hash": out_hash})

    return df.select(id_col, text_col).mapInPandas(
        _chunks, "id long, chunk_hash long"
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Paragraph-level dedup: drop every paragraph that already appeared
    anywhere in the corpus (first occurrence wins, ordered by (doc, position)),
    then reassemble documents from their surviving paragraphs — the
    sub-document dedup granularity of Dolma/RedPajama-style pipelines,
    where boilerplate (headers, license blocks, navigation) repeats
    across documents that are NOT near-duplicates as wholes.

    Returns (id, text, n_kept); documents whose every paragraph was
    dropped disappear (their content lives on in the first-occurrence
    docs).

    Scale: explode stays in codegen; the first-occurrence choice is one
    shuffle keyed on the paragraph hash (uniform); reassembly is one
    shuffle keyed on the doc id. Both keys are skew-free; state per
    group is one row. The window-over-hash and the re-group pipeline on
    the same exchange when AQE coalesces.
    """
    import re as _re

    paras = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
                "__pos", "__para"
            ),
        )
        .filter(F.trim("__para") != "")
    )
    w = Window.partitionBy(F.md5(F.col("__para").cast("binary"))).orderBy(
        "__id", "__pos"
    )
    kept = (
        paras.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    return (
        kept.groupBy("__id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__para"))),
                    lambda s: s["__para"],
                ),
                sep,
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .withColumnRenamed("__id", id_col)
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Exact duplicate-span removal: delete every k-token span that
    already occurred earlier in the corpus (first occurrence by
    (doc, position) survives), then reassemble each document from its
    surviving tokens — the ExactSubstr dedup of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed at token granularity as pure DataFrame algebra instead
    of a suffix array.

    Semantics:
    - tokens = split on single spaces, empty tokens dropped;
    - every k-token shingle that occurs >1 time in the corpus marks its
      token range [pos, pos+k) for removal at every occurrence EXCEPT
      the globally-first one (min (doc, pos) by struct order);
    - overlapping/adjacent marked ranges union per document
      (gaps-and-islands over a running max);
    - output: (id, text, n_removed) for every input document — a doc
      whose content was entirely first-occurrence has n_removed = 0, a
      fully-duplicated doc comes back with empty text.

    Scale shape (the reason this isn't a suffix array): shingle
    extraction is per-row JVM higher-order functions (no shuffle);
    the first-occurrence choice is groupBy(shingle).agg(min(struct)) —
    map-side partial aggregation absorbs hot boilerplate shingles
    BEFORE the exchange, unlike a row_number window which would ship
    every occurrence of a hot shingle to one reducer; the join back to
    occurrences is on the same key (AQE handles residual skew); island
    merging and reassembly shuffle once on the doc id (per-doc state is
    bounded by doc length). Production would shuffle xxhash64(shingle)
    instead of the string — grouping by the string here keeps the
    operator bit-identical to its SQL oracle, and the string key is
    still exact (no collision risk at any scale).
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    d = df.select(F.col(id_col).alias("__id"), toks.alias("__t"))
    # sequence(1, size-k+1) would DESCEND for short docs (Spark
    # generates a reverse range when stop < start, feeding slice an
    # out-of-domain start) — guard short docs to an empty shingle set
    n_sh = F.size("__t") - F.lit(k) + 1
    starts = F.when(n_sh >= 1, F.sequence(F.lit(1), n_sh)).otherwise(
        F.array().cast("array<int>")
    )
    shingles = d.select(
        "__id",
        F.posexplode(
            F.transform(
                starts,
                lambda i: F.array_join(F.slice("__t", i, k), " "),
            )
        ).alias("__pos", "__g"),
    )
    firsts = shingles.groupBy("__g").agg(
        F.min(F.struct(F.col("__id").alias("d"), F.col("__pos").alias("p"))).alias(
            "__f"
        ),
        F.count(F.lit(1)).alias("__n"),
    )
    dups = (
        shingles.join(firsts, "__g")
        .filter(
            (F.col("__n") > 1)
            & ~(
                (F.col("__id") == F.col("__f.d"))
                & (F.col("__pos") == F.col("__f.p"))
            )
        )
        .select("__id", F.col("__pos").alias("__s"), (F.col("__pos") + k).alias("__e"))
    )
    # gaps-and-islands: union overlapping [s, e) ranges per doc
    by_doc = Window.partitionBy("__id").orderBy("__s", "__e")
    runmax = F.max("__e").over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        dups.withColumn(
            "__new", F.when(runmax.isNull() | (F.col("__s") > runmax), 1).otherwise(0)
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(
                by_doc.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("__id", "__isl")
        .agg(F.min("__s").alias("s"), F.max("__e").alias("e"))
        .groupBy("__id")
        .agg(F.collect_list(F.struct("s", "e")).alias("__iv"))
    )
    kept = F.filter(
        F.transform(
            F.col("__t"), lambda x, i: F.struct(x.alias("tok"), i.alias("idx"))
        ),
        lambda s: ~F.coalesce(
            F.exists(
                F.col("__iv"),
                lambda v: (s["idx"] >= v["s"]) & (s["idx"] < v["e"]),
            ),
            F.lit(False),
        ),
    )
    return (
        d.join(islands, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.array_join(
                F.transform(kept, lambda s: s["tok"]), " "
            ).alias(text_col),
            (F.size("__t") - F.size(kept)).alias("n_removed"),
        )
    )
