"""Text-analysis operators for LLM training-data pipelines.

All hot-path expressions are JVM built-ins (regexp/length/split — whole-
stage codegen), no Python UDFs: these run over every document at 100 TB,
so staying inside Tungsten matters more than anywhere else.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length / punctuation / stopword ratios), language ID (stopword-marker
n-gram heuristic), document fingerprinting (rolling/content hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def marker_hits(col: Column | str, word: str) -> Column:
    """Occurrences of ``word`` as a whole token (space-padded count)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


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


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: xxhash64 of the whitespace-normalized text —
    one 64-bit key for exact-dup detection at scale (cheaper to shuffle
    than md5 strings)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.regexp_replace(F.trim(c), r"\s+", " "))
