"""Deterministic sampling & splitting for training-data pipelines.

`df.sample()` is seed-random per partition — resampling after ANY
repartition or data append changes membership. Training pipelines need
the opposite: membership that is a pure function of the ROW, so samples
are reproducible across runs, stable under appends, and identical on
every cluster size. These operators hash a key column (xxhash64,
JVM-side) into [0, 1) and threshold it — no RNG state, no shuffle, the
predicate folds into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 20  # hash resolution: rates quantize to ~1e-6


def _unit_hash(key: Column, salt: str) -> Column:
    """Deterministic uniform-ish value in [0, 1) from (key, salt)."""
    return F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(_BUCKETS)) / F.lit(
        float(_BUCKETS)
    )


def _unit_hash_md5(key: Column, salt: str) -> Column:
    """ENGINE-PORTABLE uniform in [0, 1): the first 13 hex chars of
    md5('<salt>:<key>') are 52 bits — exactly representable in a double
    — divided by 2^52 (one IEEE division, exact for a power of two).
    Bit-identical in any engine with md5 + IEEE doubles (the
    sample_weighted discipline), so membership can be differentially
    verified by an external SQL oracle. Costlier than xxhash64 (md5 +
    hex decode, still whole-stage codegen), so the JVM hash stays the
    default and this serves cross-engine-reproducible pipelines."""
    s = F.md5(
        F.concat_ws(":", F.lit(salt), key.cast("string")).cast("binary")
    )
    return F.conv(F.substring(s, 1, 13), 16, 10).cast("double") / F.lit(
        float(1 << 52)
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Keep ~rate of rows, membership = f(key): re-running, appending
    other rows, or changing parallelism never changes who's in."""
    return df.filter(_unit_hash(F.col(key_col), salt) < rate)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "strata",
    portable: bool = False,
) -> DataFrame:
    """Per-stratum rates (e.g. downsample web text, keep all code):
    the dataset-mixing primitive. Strata not in ``rates`` get
    ``default_rate``. ``portable=True`` derives membership from
    md5 instead of xxhash64 (:func:`_unit_hash_md5`) so an external
    engine reproduces the exact sample."""
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(r)).otherwise(rate)
    unit = _unit_hash_md5 if portable else _unit_hash
    return df.filter(unit(F.col(key_col), salt) < rate)


def train_test_split(
    df: DataFrame, key_col: str, test_frac: float = 0.1, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, test) split keyed by row identity.
    The same key lands on the same side forever — the property that
    prevents train/test leakage across dataset versions."""
    h = _unit_hash(F.col(key_col), salt)
    return df.filter(h >= test_frac), df.filter(h < test_frac)


def heavy_hitters(df: DataFrame, col: str, support: float) -> DataFrame:
    """Exact heavy hitters (count > support·N) without shuffling the
    full key space.

    Two passes, both scale-safe: (1) ``freqItems`` — a single-pass
    Karp/Misra-Gries-style summary with O(1/support) state per
    partition, merged on the driver — yields a GUARANTEED SUPERSET of
    every value with frequency above ``support``; (2) an exact count
    restricted to those candidates, so the shuffle carries only
    candidate rows (the `isin` filter prunes map-side) and the output
    is exact — which is why a plain GROUP BY oracle can hash-check it.

    At 100 TB the alternative (groupBy over every key) shuffles the
    whole key space to find a handful of hot values; this ships
    O(1/support) candidates + their rows."""
    candidates = df.stat.freqItems([col], support).collect()[0][0]
    total = df.count()
    return (
        df.filter(F.col(col).isin(list(candidates)))
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > support * total)
    )


def cluster_aware_split(
    labels: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Train/val/test split that NEVER separates near-duplicates: the
    split is a deterministic hash of the CLUSTER representative, so
    every member of a dup cluster lands in the same partition — the
    guard against eval contamination via near-dups of training docs
    (splitting by doc hash leaks: a test doc's near-twin trains).

    The hash is the md5 hex string compared against fixed hex threshold
    strings (0.8 = 0xc.ccc…, 0.9 = 0xe.666…): lexicographic order on
    fixed-width lowercase hex IS numeric order, so the comparison is
    engine-portable with no float conversion at all. Pure projection —
    no shuffle beyond whatever produced the labels."""

    from fractions import Fraction

    def thr(frac: Fraction) -> str:
        # integer arithmetic: float rounding would desync the oracle
        return format((frac.numerator * 16**32) // frac.denominator, "032x")

    tr = Fraction(train).limit_denominator(10**6)
    va = Fraction(val).limit_denominator(10**6)
    h = F.md5(F.col(cluster_col).cast("string").cast("binary"))
    return labels.select(
        id_col,
        cluster_col,
        F.when(h < thr(tr), "train")
        .when(h < thr(tr + va), "val")
        .otherwise("test")
        .alias("split"),
    )


def approx_distinct_portable(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    p: int = 8,
) -> DataFrame:
    """Engine-portable HyperLogLog: approx-distinct per group from
    md5-derived hashes and integer-exact register arithmetic, so a
    DuckDB oracle can recompute the ESTIMATE bit-for-bit — the hash
    gate for the sketch family (`agg_approx_distinct` uses Spark's
    built-in HLL++, whose xxhash/JVM internals no other engine can
    replay).

    Textbook Flajolet HLL: h = 60-bit md5-derived hash; bucket =
    h mod m (m = 2^p); rho = (60 - p) - bit_length(h div m) + 1
    (bit_length via the base-2 string — integer-exact in both
    engines, no float log2 edge cases); register = max(rho) per
    (group, bucket); estimate = alpha_m * m^2 / (sum over present
    buckets of 2^-M + one per empty bucket), with the small-range
    linear-counting correction (E <= 2.5m and empty buckets exist ->
    m * ln(m / V)). 2^-M and the division are exact or
    deterministically rounded IEEE ops; alpha_m inlines as one shared
    literal.

    Scale: the same mergeable-register shape as the built-in — the
    groupBy(group, bucket) max combines map-side, the shuffle carries
    at most m rows per (task, group) regardless of cardinality, and
    the final per-group fold is O(m). ~2x the built-in sketch's
    constant factor (md5 vs xxhash), which is the price of an
    engine-checkable estimate. NULLs are ignored, matching
    approx_count_distinct (an md5(NULL) row would otherwise mint a
    phantom register that skews both the harmonic sum and the
    linear-counting V)."""
    m = 1 << p
    w = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    df = df.where(F.col(col).isNotNull())
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    bucket = F.pmod(h, F.lit(m))
    rest = F.shiftright(h, p)  # integer shift — no float past 2^53
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.conv(rest.cast("string"), 10, 2)) + 1
    )
    regs = (
        df.select(*group_cols, bucket.alias("__b"), rho.alias("__rho"))
        .groupBy(*group_cols, "__b")
        .agg(F.max("__rho").alias("__M"))
    )
    # a present bucket's register is >= 1, so the linear-counting V is
    # exactly the ABSENT buckets (register 0); they also contribute
    # 2^-0 = 1 each to the harmonic sum
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__M"))).alias("__present_sum"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    v = F.lit(m) - F.col("__n_present")
    raw = F.lit(alpha * m * m) / (F.col("__present_sum") + v)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return per_group.select(
        *group_cols, F.round(est, 4).alias("approx_distinct")
    )
