"""Deduplication operators for LLM training-data pipelines.

Four tiers, each with a distinct scale profile:

- **exact**: hash-groupBy on a 64-bit content fingerprint — one shuffle
  keyed on the hash, no skew (hashes are uniform).
- **n-gram Jaccard**: exact set-similarity via token explode + self-join.
  Quadratic in the worst case — correct at test SF, superseded by LSH at
  scale (kept as the oracle-checkable ground truth).
- **MinHash + LSH banding**: shingle → K minhashes → B bands; candidate
  pairs only form inside a band bucket. Near-linear: the only join is on
  (band, bucket-signature), never all-pairs.
- **SimHash**: 64-bit bit-vote fingerprint; near-dups differ in few bits.

All token/hash work is JVM built-ins (split/explode/hash/xxhash64) —
no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest id per content fingerprint.
    Returns (fp, keeper, n_copies)."""
    return (
        df.groupBy(fingerprint(text_col).alias("fp"))
        .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
    )


def keep_latest(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Dedup-keep-latest (SURVEY §2.8): row_number over a per-key window,
    descending order column, keep rank 1. One shuffle on ``keys``."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Distinct whitespace tokens per doc: (id, tok)."""
    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
        .select("id", F.explode(F.split(F.trim("__text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact token-set Jaccard over all pairs sharing ≥1 token.

    Ground-truth operator: the token self-join is quadratic under heavy
    token sharing, so at 100 TB use :func:`minhash_lsh_pairs` and keep
    this for verification samples. Returns (id1, id2, jaccard).
    """
    # no .cache(): recomputing the cheap token projection beats pinning
    # it in executor storage for the life of the session (callers run
    # this once per invocation; a leaked cache accumulates across runs)
    tok = tokens(df, text_col, id_col)
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n_tok"))
    common = (
        tok.alias("a")
        .join(tok.alias("b"), on="tok")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.select(F.col("id").alias("id1"), F.col("n_tok").alias("n1"))
    s2 = sizes.select(F.col("id").alias("id2"), F.col("n_tok").alias("n2"))
    return (
        common.join(F.broadcast(s1), "id1")
        .join(F.broadcast(s2), "id2")
        .select(
            "id1",
            "id2",
            (
                F.col("n_common")
                / (F.col("n1") + F.col("n2") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Word n-gram shingles per doc: (id, shingle_hash).

    The token array is materialized once in a projection and the sliding
    window indexes it directly (``tk[i-1] … tk[i+n-2]``) — 3× cheaper
    than slice()-inside-transform, where Catalyst re-evaluates the split
    per element."""
    pre = df.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("tk"),
    )
    parts = ", ".join(f"tk[i-1+{j}]" for j in range(n))
    sh = F.expr(
        f"transform(sequence(1, greatest(size(tk)-{n - 1}, 0)),"
        f" i -> xxhash64(concat_ws(' ', {parts})))"
    )
    return pre.select("id", F.explode(sh).alias("shingle")).distinct()


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """K minhash values per doc from one shingle table: min over K
    independent cheap hash mixes of the shingle hash. One groupBy(id) —
    a single shuffle regardless of K."""
    mixes = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed))).alias(f"mh_{seed}")
        for seed in range(num_hashes)
    ]
    return shingled.groupBy("id").agg(*mixes)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    max_bucket: int = 1000,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """MinHash+LSH near-dup candidates, verified with exact Jaccard on
    shingle sets.

    ``token_hash="md5"`` selects the engine-portable signature variant
    (same md5-derived 60-bit hashes as
    :func:`minhash_index_signatures`), letting an external engine
    recompute the full pipeline — banding, hot-bucket star-thinning,
    and the exact-Jaccard verify — bit-for-bit; the driver's DuckDB
    oracle for ``dedup_minhash_lsh_portable`` does exactly that.

    Pipeline: shingle-set array + K minhashes + B band signatures — ALL
    in one shuffle-free projection (shingles stay an ``array<long>`` per
    doc; minhash = ``array_min`` over a hash transform; no
    explode/distinct/groupBy) → explode only the B band keys → self-join
    on (band, signature) → candidates → exact Jaccard via JVM
    ``array_intersect`` on the two shingle arrays.

    Shuffles: candidate self-join on narrow (band, sig) keys + two id
    joins to re-attach shingle arrays. The per-doc array approach holds
    to ~10⁵ shingles/doc (array must fit a row); beyond that, fall back
    to the exploded :func:`shingles`/:func:`minhash_signatures` path.
    Returns (id1, id2, jaccard).

    **Hot-bucket cap** (``max_bucket``): n identical boilerplate docs
    share every band signature, so the band self-join alone would emit
    n²·bands/2 candidate rows. Extra shingle bits cannot split identical
    content, and the all-pairs output itself is O(n²) — so over-cap
    buckets are thinned to a STAR around the bucket's min-id doc: each
    member becomes one (rep, member) candidate, then flows through the
    SAME exact-Jaccard verify. Connectivity to the representative — and
    therefore connected-component / keep-min-id dedup — is preserved for
    buckets of mutual near-dups; buckets at or under the cap keep exact
    pair enumeration unchanged.
    """
    from ..session import parallelize_small

    if token_hash not in ("xxhash64", "md5"):
        raise ValueError(
            f"token_hash must be xxhash64|md5, got {token_hash!r}"
        )
    rows = num_hashes // bands
    # single-row-group inputs scan as one task; spread the shingle/minhash
    # computation across the cluster before the heavy projection
    df = parallelize_small(df.select(id_col, text_col))
    parts = ", ".join(f"tk[i-1+{j}]" for j in range(shingle_n))
    if token_hash == "md5":
        one = (
            f"cast(conv(substring(md5(cast(concat_ws(' ', {parts}) "
            f"as binary)), 1, 15), 16, 10) as bigint)"
        )
    else:
        one = f"xxhash64(concat_ws(' ', {parts}))"
    sh_arr = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(tk)-{shingle_n - 1}, 0)),"
        f" i -> {one}))"
    )
    docs = (
        df.select(
            F.col(id_col).alias("id"),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("tk"),
        )
        # docs too short to shingle all hash to the SAME null-minhash band
        # signature — one mega-bucket whose self-join is quadratic. They
        # can't be near-dups by shingle Jaccard, so drop them up front
        # (cheap token-count predicate, BEFORE the shingle/minhash exprs,
        # so predicate pushdown duplicates only the split)
        .filter(F.size("tk") >= shingle_n)
        .select("id", sh_arr.alias("sh"))
    )

    def _minhash(seed: int):
        # single-arg lambda only: F.transform passes the array index to a
        # second parameter, which would silently shadow the seed
        if token_hash == "md5":
            return F.array_min(
                F.transform(
                    "sh",
                    lambda s: _portable_hash64(
                        F.concat_ws(":", F.lit(seed), s.cast("string"))
                    ),
                )
            )
        return F.array_min(F.transform("sh", lambda s: F.xxhash64(s, F.lit(seed))))

    mh = [_minhash(seed) for seed in range(num_hashes)]

    def _band_sig(b: int):
        cols = mh[b * rows : (b + 1) * rows]
        if token_hash == "md5":
            return F.md5(
                F.concat_ws(":", *[c.cast("string") for c in cols])
                .cast("binary")
            )
        return F.xxhash64(*cols)

    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"), _band_sig(b).alias("sig")
            )
            for b in range(bands)
        ]
    )
    stacked = docs.select("id", F.explode(band_keys).alias("bs")).select(
        "id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    # size/rep via a partition-only window, NOT aggregate+join-back: a
    # join would duplicate the shingle/minhash projection subtree; the
    # window's (band, sig) exchange is the one the candidate self-join
    # reuses anyway
    wb = Window.partitionBy("band", "sig")
    st = stacked.withColumn("__n", F.count(F.lit(1)).over(wb)).withColumn(
        "__rep", F.min("id").over(wb)
    )
    cold = st.filter(F.col("__n") <= max_bucket).select("id", "band", "sig")
    cand_cold = (
        cold.alias("a")
        .join(cold.alias("b"), on=["band", "sig"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
    )
    cand_hot = st.filter(
        (F.col("__n") > max_bucket) & (F.col("id") != F.col("__rep"))
    ).select(F.col("__rep").alias("id1"), F.col("id").alias("id2"))
    cand = cand_cold.unionByName(cand_hot).distinct()
    # Exact-Jaccard verify with ONE pass over the corpus: unpivot each
    # candidate pair into two (pair, id, side) legs, join docs ONCE on
    # id, regroup per pair. The naive form (join docs by id1, then again
    # by id2) computes AND shuffles the shingle projection twice — at
    # 100 TB that second corpus scan+shuffle dwarfs the tiny extra
    # (id1, id2) regroup shuffle this shape adds (2 rows per candidate).
    legs = cand.select(
        "id1",
        "id2",
        F.explode(
            F.array(
                F.struct(F.col("id1").alias("id"), F.lit(1).alias("side")),
                F.struct(F.col("id2").alias("id"), F.lit(2).alias("side")),
            )
        ).alias("l"),
    ).select("id1", "id2", F.col("l.id").alias("id"), F.col("l.side").alias("side"))
    paired = (
        legs.join(docs, "id")
        .groupBy("id1", "id2")
        .agg(
            # exactly one row per side per pair — first() is deterministic
            F.first(F.when(F.col("side") == 1, F.col("sh")), ignorenulls=True)
            .alias("__sh1"),
            F.first(F.when(F.col("side") == 2, F.col("sh")), ignorenulls=True)
            .alias("__sh2"),
        )
    )
    n_common = F.size(F.array_intersect("__sh1", "__sh2"))
    jac = n_common / (F.size("__sh1") + F.size("__sh2") - n_common)
    return (
        paired.select("id1", "id2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_hash: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash fingerprint per doc: per-token 64-bit hash, bit-vote
    (+1 if bit set, −1 otherwise), sign per bit → fingerprint.

    Implemented as explode → groupBy(id) with 64 conditional sums —
    one shuffle, all JVM expressions. Returns (id, simhash).

    ``token_hash``: ``"xxhash64"`` (default — fastest, one JVM hash per
    token) or ``"md5"`` — the ENGINE-PORTABLE variant: the 64-bit token
    hash is the first 16 hex chars of md5(token), reassembled as two
    32-bit words (Spark's wrapping ``shiftleft`` rebuilds the signed
    long; an ANSI engine votes on the hi/lo words directly), so an
    external oracle (DuckDB, Trino) reproduces fingerprints
    bit-identically. Same plan shape either way.
    """
    def bit_mask(b: int):
        # bit 63 is the sign bit: use min-long's two's-complement pattern
        return F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")

    if token_hash not in ("xxhash64", "md5"):
        raise ValueError(f"token_hash must be xxhash64|md5, got {token_hash!r}")
    tok = tokens(df, text_col, id_col)
    if token_hash == "md5":
        m = F.md5(F.col("tok").cast("binary"))
        hi = F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(m, 9, 8), 16, 10).cast("long")
        h = F.shiftleft(hi, 32).bitwiseOR(lo)
    else:
        h = F.xxhash64("tok")
    hashed = tok.select("id", h.alias("h"))
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(bit_mask(b)) != 0, 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(64)
    ]
    agg = hashed.groupBy("id").agg(*votes)
    fp = None
    for b in range(64):
        bit = F.when(F.col(f"v_{b}") > 0, bit_mask(b)).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return agg.select("id", fp.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup PAIRS via pigeonhole blocking.

    Two fingerprints within Hamming distance ``max_hamming`` must agree
    exactly on at least one of ``blocks`` equal bit-slices whenever
    ``max_hamming < blocks`` (pigeonhole) — so candidates form only
    inside (block_idx, block_value) buckets, never all-pairs, and the
    exact Hamming check is one ``bit_count(xor)``. Same shape as the
    MinHash banding join; cost tracks bucket occupancy.

    Returns (id1, id2, hamming).
    """
    if max_hamming >= blocks:
        raise ValueError(
            f"pigeonhole needs max_hamming < blocks ({max_hamming} >= {blocks})"
        )
    width = 64 // blocks
    fp = simhash(df, text_col, id_col, token_hash=token_hash)
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("blk"),
                F.shiftrightunsigned(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("val"),
            )
            for b in range(blocks)
        ]
    )
    stacked = fp.select("id", "simhash", F.explode(slices).alias("bs")).select(
        "id", "simhash", F.col("bs.blk").alias("blk"), F.col("bs.val").alias("val")
    )
    a, b_ = stacked.alias("a"), stacked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b_, on=["blk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id1", "id2"])
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT token-set Jaccard pairs with prefix filtering (the
    PPJoin/AllPairs family) — identical output to
    :func:`ngram_jaccard_pairs`, but scalable.

    Under a global token order (rarest first), two sets with
    J(a,b) ≥ t MUST share a token inside each one's first
    ``n - ⌈t·n⌉ + 1`` tokens: if all shared tokens sat past both
    prefixes, the overlap would be too small for the threshold. So the
    candidate join runs only on PREFIX tokens — for high thresholds
    that's a handful of the rarest tokens per doc, collapsing the
    candidate count by orders of magnitude versus joining on every
    token. A size-ratio filter (t·max ≤ min) prunes further before the
    exact verify via ``array_intersect`` on the full sorted token
    arrays. Exactness is free: verification computes true Jaccard, the
    prefix only rules out pairs that provably can't pass.

    Shuffles: token-frequency agg, per-doc array build, prefix
    self-join (narrow), and ONE id-join for the verify arrays (pair
    legs unpivoted, corpus joined once, regrouped per pair — the naive
    per-side join would scan and shuffle the expensive sorted-token
    build twice). All keys uniform except genuinely shared rare tokens
    — which is the candidate set itself.
    """
    tok = tokens(df, text_col, id_col)
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    ordered = (
        tok.join(freq, "tok")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("freq", "tok"))),
                lambda s: s["tok"],
            ).alias("toks")
        )
        .withColumn("n_tok", F.size("toks"))
        .withColumn(
            "prefix",
            F.slice(
                "toks",
                1,
                F.col("n_tok") - F.ceil(F.lit(threshold) * F.col("n_tok")) + 1,
            ),
        )
    )
    pre = ordered.select("id", "n_tok", F.explode("prefix").alias("tok"))
    a, b = pre.alias("a"), pre.alias("b")
    cands = (
        a.join(b, on="tok")
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(
            F.least(F.col("a.n_tok"), F.col("b.n_tok"))
            >= F.lit(threshold) * F.greatest(F.col("a.n_tok"), F.col("b.n_tok"))
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    # one-pass verify: unpivot pair legs, join the heavy sorted-token
    # build ONCE on id, regroup per pair (same shape as
    # minhash_lsh_pairs' verify — one corpus scan+shuffle, not two)
    legs = cands.select(
        "id1",
        "id2",
        F.explode(
            F.array(
                F.struct(F.col("id1").alias("id"), F.lit(1).alias("side")),
                F.struct(F.col("id2").alias("id"), F.lit(2).alias("side")),
            )
        ).alias("l"),
    ).select("id1", "id2", F.col("l.id").alias("id"), F.col("l.side").alias("side"))
    paired = (
        legs.join(ordered.select("id", "toks"), "id")
        .groupBy("id1", "id2")
        .agg(
            F.first(F.when(F.col("side") == 1, F.col("toks")), ignorenulls=True)
            .alias("t1"),
            F.first(F.when(F.col("side") == 2, F.col("toks")), ignorenulls=True)
            .alias("t2"),
        )
    )
    common = F.size(F.array_intersect("t1", "t2"))
    return (
        paired.withColumn("n_common", common)
        .select(
            "id1",
            "id2",
            (
                F.col("n_common")
                / (F.size("t1") + F.size("t2") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------
# Bloom-filter pre-filtered incremental dedup
# ---------------------------------------------------------------------
#
# The steady-state production shape: a mostly-novel delivery arrives and
# must be checked against a huge existing corpus. A plain hash join
# shuffles the WHOLE delivery against the fingerprint index even though
# ~99% of it is novel. A Bloom filter over the corpus fingerprints
# (~10 bits/key at 1% FPP) broadcasts to every executor and prunes the
# delivery to (true dups + false positives) BEFORE any shuffle; only
# that sliver takes the exact-verification join. No false negatives by
# construction, and false positives are removed by the exact join, so
# the result is bit-identical to the plain join — the filter is purely
# a shuffle-volume optimization (the same trick Spark's own runtime
# bloom-filter join pruning plays, here surfaced as a reusable operator
# for cross-job incremental pipelines where the corpus-side filter can
# be built once and persisted).

_SPLITMIX_GAMMA = 0x9E3779B97F4A7C15
_SPLITMIX_M1 = 0xBF58476D1CE4E5B9
_SPLITMIX_M2 = 0x94D049BB133111EB


def _make_positions(m_bits: int, k: int):
    """Return a self-contained positions(h64) -> list[int64 array]
    closure: k bit positions per key via Kirsch-Mitzenmacher double
    hashing over two splitmix64 finalizer passes.

    WORKER-SHIPPING CONTRACT: the returned closure references only its
    own locals plus numpy — never a module-level name from this package.
    Worker processes can't import ``aws_etl_project2_fiap_spark`` when
    the driver loads ``__spark_entry__.py`` by file path from outside
    the repo (the round driver does exactly that), so any closure that
    cloudpickle resolves back to this module dies on the executor with
    ModuleNotFoundError. Nested-def + local-import closures are pickled
    by value, which is why every worker-side function in this package
    is built this way."""
    gamma, m1, m2 = _SPLITMIX_GAMMA, _SPLITMIX_M1, _SPLITMIX_M2

    def positions(h64):
        import numpy as np

        def mix(z):
            z = (z + np.uint64(gamma)).astype(np.uint64)
            z = ((z ^ (z >> np.uint64(30))) * np.uint64(m1)).astype(np.uint64)
            z = ((z ^ (z >> np.uint64(27))) * np.uint64(m2)).astype(np.uint64)
            return (z ^ (z >> np.uint64(31))).astype(np.uint64)

        h1 = mix(h64)
        h2 = mix(h1) | np.uint64(1)  # odd => full-period stride
        m = np.uint64(m_bits)
        return [
            ((h1 + np.uint64(i) * h2) % m).astype(np.int64) for i in range(k)
        ]

    return positions


def _bloom_positions(h64, m_bits: int, k: int):
    """Driver/test-side alias of the worker closure's position math."""
    return _make_positions(m_bits, k)(h64)


def bloom_build(
    fp_df: DataFrame,
    fp_col: str,
    m_bits: int,
    k: int = 6,
    fan_in: int = 8,
    segment_bytes: int = 64 << 20,
) -> bytes:
    """Build a Bloom filter bitmap over an int64 fingerprint column.

    Each partition folds its keys into a local ``m_bits/8``-byte numpy
    bitmap inside ``mapInPandas`` (Arrow batches, no per-row Python)
    and emits it as SEGMENT rows of ``segment_bytes`` each (a single
    binary cell caps at 2 GB in Arrow — the 1e9-key / 1%-FPP regime's
    ~2 GB bitmap must not ride in one cell); the per-partition
    segments then OR-merge through a LOG-DEPTH tree of
    ``applyInPandas`` rounds — every round groups ``fan_in`` bitmaps
    per (group, segment) task and emits one — until a single bitmap
    remains, which the driver collects as O(m/segment_bytes) segment
    rows and concatenates. Driver traffic is ``m/8`` bytes REGARDLESS
    of partition count; cluster traffic is a geometric series ≤
    ``num_partitions x m/8 x fan_in/(fan_in-1)``. The whole tree is
    one lazy plan — a single job executes fold + merge rounds.
    """
    import math as _math

    n_bytes = m_bits // 8
    positions = _make_positions(m_bits, k)
    col = fp_col
    seg = min(segment_bytes, n_bytes)

    def per_partition(batches):
        import numpy as np
        import pandas as pd

        bits = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            h = pdf[col].to_numpy(dtype=np.int64).view(np.uint64)
            for pos in positions(h):
                np.bitwise_or.at(
                    bits, pos >> 3, np.left_shift(1, (pos & 7)).astype(np.uint8)
                )
        yield pd.DataFrame(
            {
                "seg": list(range(0, n_bytes, seg)),
                "bitmap": [
                    bits[off : off + seg].tobytes()
                    for off in range(0, n_bytes, seg)
                ],
            }
        )

    def or_group(key, pdf):
        import numpy as np
        import pandas as pd

        acc = np.frombuffer(pdf["bitmap"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["bitmap"].iloc[1:]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame(
            {"i": [key[0]], "seg": [key[1]], "bitmap": [acc.tobytes()]}
        )

    parts = fp_df.select(fp_col).mapInPandas(
        per_partition, "seg long, bitmap binary"
    )
    # one row per (partition, segment), keyed by partition id; each
    # round divides the key space by fan_in and ORs within
    # (group, segment) — segments of one bitmap merge independently
    cur = parts.select(
        F.spark_partition_id().cast("long").alias("i"), "seg", "bitmap"
    )
    n = max(1, parts.rdd.getNumPartitions())
    for _ in range(max(1, _math.ceil(_math.log(max(n, 2), fan_in)))):
        cur = (
            cur.withColumn("i", (F.col("i") / fan_in).cast("long"))
            .groupBy("i", "seg")
            .applyInPandas(or_group, "i long, seg long, bitmap binary")
        )
    rows = cur.collect()
    n_segs = -(-n_bytes // seg)
    assert len(rows) == n_segs, (
        f"bloom merge tree left {len(rows)} rows, expected {n_segs} segments"
    )
    return b"".join(r["bitmap"] for r in sorted(rows, key=lambda r: r["seg"]))


def bloom_might_contain(spark, bitmap: bytes, m_bits: int, k: int = 6):
    """Vectorized membership probe: returns a pandas_udf(boolean) over
    an int64 fingerprint column. The bitmap rides to executors as a
    Spark broadcast (one copy per worker, not per task)."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(bitmap)
    positions = _make_positions(m_bits, k)

    def _probe_fn(s):
        import numpy as np
        import pandas as pd

        bits = np.frombuffer(bc.value, dtype=np.uint8)
        h = s.to_numpy(dtype=np.int64).view(np.uint64)
        hit = np.ones(len(h), dtype=bool)
        for pos in positions(h):
            hit &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
        return pd.Series(hit)

    # plain-function form: `from __future__ import annotations` stringifies
    # type hints, which pandas_udf can't resolve for locally-imported pd
    return pandas_udf(_probe_fn, "boolean")


def bloom_bits_for(n_keys: int, bits_per_key: int = 10) -> int:
    """Bitmap size: ~10 bits/key ≈ 1% FPP at k=6-7; rounded up to a
    power of two so the mod in _bloom_positions stays cheap."""
    m = max(1024, n_keys * bits_per_key)
    return 1 << (m - 1).bit_length()


def bloom_incremental_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits_per_key: int = 10,
) -> DataFrame:
    """Flag which rows of ``new_df`` already exist (by exact text) in
    ``corpus_df`` — same contract as the plain hash-join incremental
    dedup, but Bloom-pre-filtered so only probable dups shuffle.

    Plan: corpus scan → per-partition bitmap fold (narrow) → broadcast;
    delivery scan → vectorized probe (narrow) → the ~(dup_rate + FPP)
    candidate sliver joins the exact md5 index; bloom-negative rows are
    definitively novel and never shuffle. Exactness: the bloom holds
    EVERY corpus xxhash64, so a true dup always probes positive (no
    false negatives); positives are re-verified on md5, removing false
    positives — output equals the plain join bit-for-bit.

    The single ``corpus.count()`` driver action sizes the bitmap (one
    scalar, same justification as the a1 cutoff inline)."""
    spark = new_df.sparkSession
    fp64 = F.xxhash64(text_col)
    fpm = F.md5(F.col(text_col).cast("binary"))

    n_keys = corpus_df.count()
    m_bits = bloom_bits_for(n_keys, bits_per_key)
    bitmap = bloom_build(
        corpus_df.select(fp64.alias("fp64")), "fp64", m_bits
    )
    probe = bloom_might_contain(spark, bitmap, m_bits)

    probed = new_df.select(
        id_col, fpm.alias("fpm"), probe(fp64).alias("cand")
    )
    corpus_index = corpus_df.select(fpm.alias("fpm")).distinct()
    confirmed = (
        probed.filter(F.col("cand"))
        .join(corpus_index.withColumn("__hit", F.lit(1)), "fpm", "left")
        .select(id_col, F.col("__hit").isNotNull().alias("is_dup"))
    )
    novel = probed.filter(~F.col("cand")).select(
        id_col, F.lit(False).alias("is_dup")
    )
    return confirmed.unionByName(novel)


# ---------------------------------------------------------------------
# Incremental MinHash near-dup index (batch vs persisted corpus)
# ---------------------------------------------------------------------
#
# The production steady state for NEAR-dup (the fuzzy analogue of
# incremental_dedup/bloom above): a delivery must be checked against a
# 100 TB corpus for near-duplicates WITHOUT rescanning or reshuffling
# corpus text. The corpus is summarized ONCE into a persisted signature
# index — (band, sig, id, minhashes) — stored as a versioned table
# (io/versioned.py), so the index itself has commit history, replayable
# appends, and time travel. A probe broadcasts the delivery's band
# signatures against the index: the corpus side never shuffles, and
# similarity is estimated from the stored signatures alone (fraction of
# agreeing minhashes — the standard unbiased Jaccard estimator), so
# corpus TEXT is never touched again. Novel docs' signatures append as
# one more commit: cost per delivery is O(delivery + index scan), and
# the index is ~num_hashes longs per doc — ~0.1% of corpus bytes.


def _portable_hash64(col: Column) -> Column:
    """60-bit engine-portable hash: the first 15 hex chars of md5,
    reassembled as a positive BIGINT. Recomputable in any engine with
    md5 + hex→int (DuckDB: ``('0x'||substring(md5(s),1,15))::BIGINT``)
    — the property the oracle-backed near-dup gate needs. 15 hex chars
    (60 bits) rather than 16 so the value never overflows a signed
    64-bit int on either engine."""
    return F.conv(
        F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def minhash_index_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Per-doc signature rows for the index: (id, mh array<long>, band,
    sig) — one row per band. Same shuffle-free projection as
    :func:`minhash_lsh_pairs` (shingle array → K minhashes → B band
    keys, no explode/groupBy on shingles); docs too short to shingle
    are excluded (they cannot near-dup by shingle Jaccard).

    ``token_hash``: ``"xxhash64"`` (default, fastest — one JVM hash per
    shingle) or ``"md5"``, the ENGINE-PORTABLE variant: shingle hash,
    per-seed minhash mix, and band signature are all md5-derived
    (:func:`_portable_hash64`), so an external engine can recompute the
    exact signatures — the driver's DuckDB oracle for the near-dup
    ingest gate does. The two variants produce disjoint signature
    spaces; the index's params sidecar pins whichever it was built
    with."""
    if token_hash not in ("xxhash64", "md5"):
        raise ValueError(
            f"token_hash must be xxhash64|md5, got {token_hash!r}"
        )
    rows = num_hashes // bands
    parts = ", ".join(f"tk[i-1+{j}]" for j in range(shingle_n))
    if token_hash == "md5":
        one = (
            f"cast(conv(substring(md5(cast(concat_ws(' ', {parts}) "
            f"as binary)), 1, 15), 16, 10) as bigint)"
        )
    else:
        one = f"xxhash64(concat_ws(' ', {parts}))"
    sh_arr = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(tk)-{shingle_n - 1}, 0)),"
        f" i -> {one}))"
    )
    docs = (
        df.select(
            F.col(id_col).alias("id"),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("tk"),
        )
        .filter(F.size("tk") >= shingle_n)
        .select("id", sh_arr.alias("sh"))
    )
    def _mh(seed: int):
        # single-arg lambda via factory: a defaulted second parameter
        # would make F.transform pass the ARRAY INDEX into it, silently
        # replacing the seed (same pitfall noted in minhash_lsh_pairs)
        if token_hash == "md5":
            return F.array_min(
                F.transform(
                    "sh",
                    lambda s: _portable_hash64(
                        F.concat_ws(":", F.lit(seed), s.cast("string"))
                    ),
                )
            )
        return F.array_min(F.transform("sh", lambda s: F.xxhash64(s, F.lit(seed))))

    mh = F.array(*[_mh(seed) for seed in range(num_hashes)])
    sig = docs.select("id", mh.alias("mh"))

    def _band_sig(b: int) -> Column:
        cols = [F.col("mh")[i] for i in range(b * rows, (b + 1) * rows)]
        if token_hash == "md5":
            return F.md5(
                F.concat_ws(":", *[c.cast("string") for c in cols])
                .cast("binary")
            )
        return F.xxhash64(*cols)

    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"), _band_sig(b).alias("sig")
            )
            for b in range(bands)
        ]
    )
    return sig.select("id", "mh", F.explode(band_keys).alias("bs")).select(
        "id", "mh", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def _check_index_params(
    index_path: str, shingle_n: int, num_hashes: int, bands: int,
    write: bool = False, token_hash: str = "xxhash64",
) -> None:
    """Persist/validate the signature parameters beside the index. A
    probe or append whose (shingle_n, num_hashes, bands, token_hash)
    differ from the build's would produce band signatures that match
    NOTHING — a silent all-clear over a corpus full of duplicates — so
    a mismatch is a hard error, not a wrong answer."""
    import json
    import os

    params = {"shingle_n": shingle_n, "num_hashes": num_hashes,
              "bands": bands, "token_hash": token_hash}
    ppath = os.path.join(index_path, "_minhash_params.json")
    if write:
        os.makedirs(index_path, exist_ok=True)
        with open(ppath, "w") as fh:
            json.dump(params, fh)
        return
    try:
        with open(ppath) as fh:
            stored = json.load(fh)
    except FileNotFoundError:
        return  # pre-params index: caller's responsibility (documented)
    # indexes written before token_hash existed were all xxhash64
    stored.setdefault("token_hash", "xxhash64")
    if stored != params:
        raise ValueError(
            f"minhash index at {index_path} was built with {stored}; "
            f"probing/appending with {params} would silently match "
            f"nothing — use the stored parameters"
        )


def build_minhash_index(
    df: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    extra: dict | None = None,
    token_hash: str = "xxhash64",
) -> int:
    """Create the persisted signature index (versioned table v1) from
    the current corpus. One corpus pass; index size ≈ bands rows ×
    (num_hashes+3) longs per doc. The signature parameters persist in
    a sidecar and later probes/appends are validated against them."""
    from ..io import versioned as V

    _check_index_params(
        index_path, shingle_n, num_hashes, bands, write=True,
        token_hash=token_hash,
    )
    return V.create_table(
        minhash_index_signatures(
            df, text_col, id_col, shingle_n, num_hashes, bands,
            token_hash=token_hash,
        ),
        index_path,
        extra=extra,
    )


def append_to_minhash_index(
    df: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    extra: dict | None = None,
    token_hash: str = "xxhash64",
) -> int:
    """Append a delivery's signatures as one more versioned commit —
    the accepted-novel-docs half of the incremental loop. Retries are
    the caller's concern only across processes; within a stream use
    streaming.sinks.versioned_sink semantics (``extra`` carries the
    stream's ``batch_id`` replay marker into the index's manifest)."""
    from ..io import versioned as V

    _check_index_params(
        index_path, shingle_n, num_hashes, bands, token_hash=token_hash
    )
    return V.append_table(
        minhash_index_signatures(
            df, text_col, id_col, shingle_n, num_hashes, bands,
            token_hash=token_hash,
        ),
        index_path,
        extra=extra,
    )


def probe_minhash_index(
    spark,
    index_path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    version: int | None = None,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs (batch_id, index_id, est_jaccard) between a
    delivery and the persisted corpus index.

    The delivery's band signatures BROADCAST to the index scan (CI-
    gated): the corpus side is one unshuffled scan of signature rows —
    no corpus text read, no corpus shuffle, no index rebuild.
    ``est_jaccard`` is the minhash agreement fraction
    E[matches/K] = J(a,b); with K=16 the estimator's std-err is ~0.12
    at J=0.5 — callers needing exactness re-verify candidates against
    text (minhash_lsh_pairs' verify stage) on the candidate sliver
    only. A pair colliding in several bands dedups via max()."""
    from ..io import versioned as V

    _check_index_params(
        index_path, shingle_n, num_hashes, bands, token_hash=token_hash
    )
    idx = V.read_table(spark, index_path, version=version)
    q = minhash_index_signatures(
        batch, text_col, id_col, shingle_n, num_hashes, bands,
        token_hash=token_hash,
    ).select(
        F.col("id").alias("__qid"),
        F.col("mh").alias("__qmh"),
        "band",
        "sig",
    )
    est = (
        F.aggregate(
            F.zip_with("mh", "__qmh", lambda a, b: (a == b).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / num_hashes
    )
    return (
        idx.join(F.broadcast(q), ["band", "sig"])
        .select(
            F.col("__qid").alias("batch_id"),
            F.col("id").alias("index_id"),
            est.alias("est_jaccard"),
        )
        .groupBy("batch_id", "index_id")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )
