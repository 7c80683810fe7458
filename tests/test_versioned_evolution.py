"""Partition-spec evolution on versioned tables
(io/versioned.alter_clustering + cluster-spec table state).

Reference parity: the reference's daily jobs hard-code one partition
layout forever (`/root/reference` writes day-partitioned parquet and
can only change layout by a manual full reload). The lakehouse layer
here carries the Iceberg partition-spec-evolution shape instead:

- the clustering declared at CREATE becomes table STATE (a spec with
  an id), inherited by every commit like the column mapping;
- ``alter_clustering`` is METADATA-ONLY — same file list, zero data
  IO, spec id bumped; old files stay readable under their old layout;
- writes after the flip lay out under the new spec (file entries are
  tagged with the spec id they were written under);
- ``compact_table`` migrates old-spec files forward; DESCRIBE reports
  per-spec file counts so migration progress is observable;
- rename/drop of a clustering column relabels/evolves the spec;
  rollback and time travel restore each version's own spec.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io import versioned as V


def _mk(spark, n=400):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 10).alias("day"),
        (F.col("id") % 7).alias("region"),
        (F.col("id") * 2).alias("val"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_create_records_spec_and_tags_files(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark), path, cluster_by=["day"], num_files=4)
    spec = V.table_cluster_spec(path)
    assert spec == {"spec_id": 1, "cols": ["day"]}
    d = V.describe_table(path)
    assert d["cluster_spec"] == spec
    assert d["files_by_spec"] == {1: d["num_files"]}


def test_append_defaults_to_current_spec(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark), path, cluster_by=["day"], num_files=4)
    V.append_table(_mk(spark, 100), path)
    files = V._read_manifest(path, V.current_version(path))["files"]
    assert all(f.get("spec_id") == 1 for f in files)
    # clustered-by-default batches carry tight per-file day stats: an
    # eq-day read prunes to a strict subset of files
    kept, _ = V.prunable(files, "day", 3, 3)
    assert 0 < len(kept) < len(files)


def test_alter_clustering_is_metadata_only(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark), path, cluster_by=["day"], num_files=4)
    before = _rows(V.read_table(spark, path))
    m1 = V._read_manifest(path, V.current_version(path))
    v2 = V.alter_clustering(path, ["region"])
    m2 = V._read_manifest(path, v2)
    # same file list byte-for-byte — no data IO happened
    assert [f["path"] for f in m2["files"]] == [
        f["path"] for f in m1["files"]
    ]
    assert m2["cluster_spec"] == {"spec_id": 2, "cols": ["region"]}
    # old-layout files remain fully readable
    assert _rows(V.read_table(spark, path)) == before
    # history records the DDL
    assert any(
        "CLUSTER_BY(region)" in h["operation"]
        for h in V.table_history(path)
    )


def test_writes_after_alter_use_new_spec(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark), path, cluster_by=["day"], num_files=4)
    V.alter_clustering(path, ["region"])
    V.append_table(_mk(spark, 100), path)
    files = V._read_manifest(path, V.current_version(path))["files"]
    by_spec = V.describe_table(path)["files_by_spec"]
    assert set(by_spec) == {1, 2}
    new = [f for f in files if f.get("spec_id") == 2]
    # new batch is region-clustered: per-file region ranges are tight
    # (no single file spans every region value)
    spans = [f["stats"]["region"] for f in new]
    assert any(lo == hi for lo, hi in spans) or all(
        hi - lo < 6 for lo, hi in spans
    )


def test_compact_migrates_to_current_spec(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark), path, cluster_by=["day"], num_files=4)
    before = _rows(V.read_table(spark, path))
    V.alter_clustering(path, ["region"])
    V.compact_table(spark, path, target_files=4)
    d = V.describe_table(path)
    assert d["files_by_spec"] == {2: d["num_files"]}
    files = V._read_manifest(path, V.current_version(path))["files"]
    # post-migration an eq-region read prunes files — the new layout
    # is physically real, not just a tag
    kept, _ = V.prunable(files, "region", 2, 2)
    assert 0 < len(kept) < len(files)
    assert _rows(V.read_table(spark, path)) == before


def test_incremental_compact_migrates_small_files(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark), path, cluster_by=["day"], num_files=4)
    V.alter_clustering(path, ["region"])
    # two small unmigrated dribbles (explicit off-spec layout)
    V.append_table(_mk(spark, 30), path, cluster_by=["day"], num_files=1)
    V.append_table(_mk(spark, 30), path, cluster_by=["day"], num_files=1)
    before = _rows(V.read_table(spark, path))
    V.compact_table(spark, path, small_only_bytes=1 << 20)
    files = V._read_manifest(path, V.current_version(path))["files"]
    assert any(f.get("spec_id") == 2 for f in files)
    assert _rows(V.read_table(spark, path)) == before


def test_unknown_column_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark), path)
    with pytest.raises(ValueError, match="nope"):
        V.alter_clustering(path, ["nope"])


def test_noop_and_unclustering(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark), path, cluster_by=["day"], num_files=2)
    v = V.current_version(path)
    # same spec → no new version
    assert V.alter_clustering(path, ["day"]) == v
    # un-cluster: spec id advances, cols empty, appends stop tagging
    v2 = V.alter_clustering(path, None)
    assert v2 == v + 1
    assert V.table_cluster_spec(path) == {"spec_id": 2, "cols": []}
    V.append_table(_mk(spark, 50), path)
    files = V._read_manifest(path, V.current_version(path))["files"]
    assert all(
        f.get("spec_id") != 2 or False
        for f in files
        if f.get("spec_id") is None
    )
    assert sum(1 for f in files if f.get("spec_id") is None) > 0


def test_rename_relabels_spec_in_place(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark), path, cluster_by=["day"], num_files=2)
    V.rename_column(path, "day", "dia")
    assert V.table_cluster_spec(path) == {"spec_id": 1, "cols": ["dia"]}
    # appends keep clustering under the renamed logical name
    df = _mk(spark, 60).withColumnRenamed("day", "dia")
    V.append_table(df, path)
    files = V._read_manifest(path, V.current_version(path))["files"]
    assert all(f.get("spec_id") == 1 for f in files)


def test_drop_clustering_column_evolves_spec(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(
        _mk(spark), path, cluster_by=["day", "region"], num_files=2
    )
    V.drop_column(path, "region")
    assert V.table_cluster_spec(path) == {"spec_id": 2, "cols": ["day"]}
    assert "region" not in V.read_table(spark, path).columns


def test_rollback_and_time_travel_restore_spec(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = V.create_table(_mk(spark), path, cluster_by=["day"], num_files=2)
    v2 = V.alter_clustering(path, ["region"])
    assert V.table_cluster_spec(path, version=v1) == {
        "spec_id": 1, "cols": ["day"]
    }
    assert V.table_cluster_spec(path, version=v2) == {
        "spec_id": 2, "cols": ["region"]
    }
    V.rollback(path, v1)
    assert V.table_cluster_spec(path) == {"spec_id": 1, "cols": ["day"]}
    # post-rollback appends lay out under the RESTORED spec
    V.append_table(_mk(spark, 40), path)
    files = V._read_manifest(path, V.current_version(path))["files"]
    assert all(f.get("spec_id") == 1 for f in files)


def test_overwrite_keeps_spec_and_lays_out_under_it(spark, tmp_path):
    path = str(tmp_path / "t")
    V.create_table(_mk(spark), path, cluster_by=["day"], num_files=2)
    V.overwrite_table(_mk(spark, 200), path)
    assert V.table_cluster_spec(path) == {"spec_id": 1, "cols": ["day"]}
    d = V.describe_table(path)
    assert d["files_by_spec"] == {1: d["num_files"]}


def test_clone_carries_spec(spark, tmp_path):
    src, shallow, deep = (
        str(tmp_path / "s"), str(tmp_path / "c1"), str(tmp_path / "c2")
    )
    V.create_table(_mk(spark), src, cluster_by=["day"], num_files=2)
    V.alter_clustering(src, ["region"])
    V.clone_table(spark, src, shallow)
    assert V.table_cluster_spec(shallow) == {
        "spec_id": 2, "cols": ["region"]
    }
    V.clone_table(spark, src, deep, deep=True)
    # deep clone restarts spec history but keeps the clustering intent
    assert V.table_cluster_spec(deep) == {"spec_id": 1, "cols": ["region"]}


def test_mutations_preserve_reads_across_evolution(spark, tmp_path):
    """End-to-end: evolve the spec mid-life, run CoW + MoR mutations,
    and verify reads stay exact at every step."""
    path = str(tmp_path / "t")
    V.create_table(_mk(spark), path, cluster_by=["day"], num_files=4)
    V.alter_clustering(path, ["region"])
    V.append_table(_mk(spark, 100), path)
    V.delete_from(spark, path, F.col("id") % 13 == 0, mode="dv")
    V.update_table(
        spark, path, {"val": F.col("val") + 1}, F.col("region") == 3
    )
    V.compact_table(spark, path, target_files=3)
    got = V.read_table(spark, path)
    import pandas as pd

    base = pd.concat(
        [_mk(spark).toPandas(), _mk(spark, 100).toPandas()]
    )
    base = base[base["id"] % 13 != 0].copy()
    base.loc[base["region"] == 3, "val"] += 1
    exp = sorted(map(tuple, base[["id", "day", "region", "val"]].values))
    assert _rows(got.select("id", "day", "region", "val")) == [
        tuple(int(x) for x in t) for t in exp
    ]


# --------------------------------------------------------------------------
# Hidden-partitioning transforms: year/month/day/hour, truncate, bucket


def test_bucket_python_matches_spark(spark):
    """_bucket_of (driver-side probe hashing) must be byte-identical to
    the Spark bucket() expression for every type it claims to handle —
    a divergence would FALSELY PRUNE a file and silently drop rows."""
    import datetime as dt

    from aws_etl_project2_fiap_spark.io.versioned import (
        _bucket_of,
        _transform_expr,
    )

    vals = [
        0, 1, -1, 7, -97, 2**40, -(2**40),
        "a", "B", "", "naïve-ünïcode", "with space", "a+b/c",
        dt.date(1995, 3, 15), dt.date(1970, 1, 1),
    ]
    df = spark.createDataFrame(
        [(str(i), v) for i, v in enumerate(vals) if isinstance(v, int)],
        "i string, v long",
    ).withColumn("b", _transform_expr("bucket", 8, "v", None))
    got = {r["v"]: r["b"] for r in df.collect()}
    for v in vals:
        if isinstance(v, int):
            assert got[v] == _bucket_of(v, 8, "bigint"), v
    sdf = spark.createDataFrame(
        [(v,) for v in vals if isinstance(v, str)], "v string"
    ).withColumn("b", _transform_expr("bucket", 8, "v", None))
    for r in sdf.collect():
        assert r["b"] == _bucket_of(r["v"], 8, "string"), r["v"]
    ddf = spark.createDataFrame(
        [(v,) for v in vals if isinstance(v, dt.date)], "v date"
    ).withColumn("b", _transform_expr("bucket", 8, "v", None))
    for r in ddf.collect():
        assert r["b"] == _bucket_of(r["v"], 8, "date"), r["v"]


def test_bucket_spec_prunes_point_reads(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(2000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    V.create_table(df, path, cluster_by=["bucket(8,k)"], num_files=8)
    files = V._read_manifest(path, 1)["files"]
    assert all("buckets" in f for f in files)
    kept, skipped = V.prunable_bucket(files, "k", "key_1234")
    assert skipped, "bucket membership must prune most files"
    assert len(kept) < len(files)
    got = V.read_table(spark, path, eq=("k", "key_1234")).collect()
    assert [(r["k"], r["v"]) for r in got] == [("key_1234", 3702)]
    # absent key: correct empty result through the same pruned path
    assert V.read_table(spark, path, eq=("k", "nope")).count() == 0


def test_month_transform_hidden_partitioning(spark, tmp_path):
    """Users filter on the RAW date column; files clustered by
    month(d) have month-tight raw stats, so ordinary min/max pruning
    answers the predicate — no partition column anywhere."""
    path = str(tmp_path / "t")
    df = spark.sql(
        "SELECT date_add(date'1995-01-01', CAST(id % 360 AS INT)) AS d, "
        "id AS v FROM range(3000)"
    )
    V.create_table(df, path, cluster_by=["month(d)"], num_files=12)
    files = V._read_manifest(path, 1)["files"]
    kept, _ = V.prunable(files, "d", "1995-03-01", "1995-03-31")
    assert 0 < len(kept) < len(files)
    got = V.read_table(
        spark, path, between=("d", "1995-03-01", "1995-03-31")
    )
    exp = df.filter(F.col("d").between("1995-03-01", "1995-03-31"))
    assert _rows(got) == _rows(exp)


def test_truncate_transform_numeric_and_string(spark, tmp_path):
    p1, p2 = str(tmp_path / "n"), str(tmp_path / "s")
    dfn = spark.range(1000).select((F.col("id") * 7 % 900).alias("v"))
    V.create_table(dfn, p1, cluster_by=["truncate(100,v)"], num_files=6)
    files = V._read_manifest(p1, 1)["files"]
    kept, _ = V.prunable(files, "v", 200, 299)
    assert 0 < len(kept) < len(files)
    assert _rows(V.read_table(spark, p1, between=("v", 200, 299))) == _rows(
        dfn.filter(F.col("v").between(200, 299))
    )
    dfs = spark.range(900).select(
        F.concat(
            F.lpad((F.col("id") % 26).cast("string"), 2, "0"),
            F.lit("_suffix_"), F.col("id"),
        ).alias("s")
    )
    V.create_table(dfs, p2, cluster_by=["truncate(2,s)"], num_files=6)
    files = V._read_manifest(p2, 1)["files"]
    kept, _ = V.prunable(files, "s", "07", "08")
    assert 0 < len(kept) < len(files)


def test_transform_canonicalization_and_rename(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    V.create_table(df, path)
    V.alter_clustering(path, ["bucket( 8 , k )"])
    assert V.table_cluster_spec(path)["cols"] == ["bucket(8,k)"]
    V.rename_column(path, "k", "key")
    assert V.table_cluster_spec(path)["cols"] == ["bucket(8,key)"]
    # dropping the source column evolves the spec away from it
    # (spec history: alter minted spec 1, rename kept it, drop bumps)
    V.drop_column(path, "key")
    assert V.table_cluster_spec(path) == {"spec_id": 2, "cols": []}


def test_alter_to_bucket_then_compact_migrates(spark, tmp_path):
    """The full evolution loop with a transform target: flip to a
    bucket spec metadata-only, OPTIMIZE migrates, point reads prune
    via the new files' bucket membership."""
    path = str(tmp_path / "t")
    df = spark.range(2000).select(
        F.concat(F.lit("u"), F.col("id")).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    V.create_table(df, path, num_files=4)
    before = _rows(V.read_table(spark, path))
    V.alter_clustering(path, ["bucket(8,k)"])
    old_files = V._read_manifest(path, V.current_version(path))["files"]
    assert not any("buckets" in f for f in old_files)
    # pre-migration point read: no bucket metadata → no pruning, still
    # correct
    assert V.read_table(spark, path, eq=("k", "u77")).count() == 1
    V.compact_table(spark, path, target_files=8)
    files = V._read_manifest(path, V.current_version(path))["files"]
    assert all("buckets" in f for f in files)
    kept, skipped = V.prunable_bucket(files, "k", "u77")
    assert skipped and len(kept) < len(files)
    assert V.read_table(spark, path, eq=("k", "u77")).count() == 1
    assert _rows(V.read_table(spark, path)) == before


def test_bucket_under_column_mapping(spark, tmp_path):
    """Transform specs speak LOGICAL names: after a rename the spec
    relabels, appends keep bucketing on the renamed column's PHYSICAL
    bytes, and eq-reads on the new logical name still prune."""
    path = str(tmp_path / "t")
    df = spark.range(1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc"),
        (F.col("id") * 2).alias("v"),
    )
    V.create_table(df, path, cluster_by=["bucket(8,doc)"], num_files=8)
    V.rename_column(path, "doc", "doc_id")
    df2 = spark.range(1000, 1500).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") * 2).alias("v"),
    )
    V.append_table(df2, path)
    files = V._read_manifest(path, V.current_version(path))["files"]
    assert all("buckets" in f for f in files)
    # physical key inside the metadata stays the frozen physical name
    assert all("bucket(8,doc)" in f["buckets"] for f in files)
    got = V.read_table(spark, path, eq=("doc_id", "d1200")).collect()
    assert [(r["doc_id"], r["v"]) for r in got] == [("d1200", 2400)]


def test_merge_prunes_by_bucket_membership(spark, tmp_path):
    """A delivery-sized MERGE into a bucket-clustered table probes
    only the files whose bucket sets intersect the source's keys —
    the hidden-partitioning twin of the bloom probe, with zero index
    bytes."""
    path = str(tmp_path / "t")
    df = spark.range(4000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") * 10).alias("v"),
    )
    V.create_table(df, path, cluster_by=["bucket(16,k)"], num_files=16)
    n_files = len(V._read_manifest(path, 1)["files"])
    # delivery: 5 keys, all hashing into few buckets
    src = spark.createDataFrame(
        [(f"k{i}", -1) for i in (3, 5, 8, 13, 21)], "k string, v long"
    )
    res = V.merge_table(spark, path, src, keys=["k"])
    assert res["files_touched"] < n_files
    # files_touched is post-probe; the manifest proves only touched
    # files were rewritten
    assert res["files_reused"] >= n_files - 5
    got = V.read_table(spark, path)
    assert got.filter(F.col("v") == -1).count() == 5
    assert got.count() == 4000


def test_spec_default_append_does_not_expand_micro_batches(spark, tmp_path):
    """A 2-partition micro-batch appended to a spec-clustered table
    must not fan out into defaultParallelism tiny files (the streaming
    dribble would explode the file count per commit)."""
    path = str(tmp_path / "t")
    V.create_table(_mk(spark, 1000), path, cluster_by=["day"], num_files=4)
    batch = _mk(spark, 40).repartition(2)
    V.append_table(batch, path)
    files = V._read_manifest(path, V.current_version(path))["files"]
    new = [f for f in files if f.get("spec_id") == 1]
    # 4 create files + at most 2 appended files
    assert len(files) <= 6 and len(new) == len(files)


def test_bucket_prune_refuses_dtype_mismatch(spark, tmp_path):
    """ADVICE r6: probing a DOUBLE bucket-clustered column with a
    Python int must NOT prune (Spark rendered '5.0' into membership,
    the driver would hash '5' into the wrong bucket) — the read stays
    correct, pruning just declines. Matching dtypes still prune."""
    path = str(tmp_path / "t")
    df = spark.range(2000).select(
        (F.col("id") * 1.0).alias("k"),  # DOUBLE key
        (F.col("id") * 3).alias("v"),
    )
    V.create_table(df, path, cluster_by=["bucket(8,k)"], num_files=8)
    files = V._read_manifest(path, 1)["files"]
    assert all("bucket_dtypes" in f for f in files)
    # int probe on a double column: no pruning, but the READ is exact
    kept, skipped = V.prunable_bucket(files, "k", 1234)
    assert not skipped and len(kept) == len(files)
    got = V.read_table(spark, path, eq=("k", 1234.0)).collect()
    assert [(r["k"], r["v"]) for r in got] == [(1234.0, 3702)]
    # float probe: also declines (rendering never trusted)
    kept2, skipped2 = V.prunable_bucket(files, "k", 1234.0)
    assert not skipped2
    # a STRING-keyed table still prunes string probes (unchanged path)
    p2 = str(tmp_path / "t2")
    V.create_table(
        spark.range(2000).select(
            F.concat(F.lit("key_"), F.col("id")).alias("k"),
            (F.col("id") * 3).alias("v"),
        ),
        p2, cluster_by=["bucket(8,k)"], num_files=8,
    )
    f2 = V._read_manifest(p2, 1)["files"]
    kept3, skipped3 = V.prunable_bucket(f2, "k", "key_1234")
    assert skipped3 and len(kept3) < len(f2)
    # but an INT probe against the string column declines
    kept4, skipped4 = V.prunable_bucket(f2, "k", 1234)
    assert not skipped4
