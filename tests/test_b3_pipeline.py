"""Golden-pipeline tests (SURVEY §5.3): replay the reference's pipelines
on FIXTURES.md-shaped synthetic data, including the real irregularities —
per-partition schema drift (F1/F2), the leaked ``valor_limpo`` temp
column (F4), pt-BR number parsing (F3), and both A1 semantics (F7).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.io.catalog import (
    create_database,
    create_table_if_not_exists,
    save_as_table,
)
from aws_etl_project2_fiap_spark.io.update import update_table
from aws_etl_project2_fiap_spark.operators.cleaning import clean_b3
from aws_etl_project2_fiap_spark.plans import b3, btc

TICKERS = [("AAAA3", "ALPHA SA", "ON NM"), ("BBBB4", "BETA S/A", "PN N1"),
           ("CCCC3", "GAMMA 2154", "ON ED NM"), ("DDDD11", "DELTA UNT", "UNT N2"),
           ("EEEE3", "EPSILON", "ON"), ("FFFF4", "ZETA PART", "PN")]


def _qt(day: int, i: int) -> int:
    # deterministic per (day, ticker) theoretical quantity
    return 1_000_000_000 + day * 1_000_000 + i * 111_111


@pytest.fixture(scope="module")
def raw_zone(spark, tmp_path_factory) -> str:
    """F1+F2+F4: 10 consecutive days under ano=/mes=/dia=; days 1-2 lack
    data_hora (v0 writer), day 3 leaks valor_limpo (Glue source schema),
    the rest are v1-shaped."""
    root = tmp_path_factory.mktemp("b3_raw")
    base = dt.date(2025, 8, 1)
    for day in range(10):
        d = base + dt.timedelta(days=day)
        rows = []
        for i, (cod, acao, tipo) in enumerate(TICKERS):
            row = {
                "cod": cod, "acao": acao, "tipo": tipo,
                "qtde_teorica": _qt(day, i),
                "part_teorica_porc": round(0.1 + i * 0.5, 3),
            }
            if day >= 2:  # v1 writer adds the string timestamp
                row["data_hora"] = f"{d} 18:00:00"
            if day == 2:  # Glue source leaks the temp column
                row["valor_limpo"] = str(_qt(day, i))
            rows.append(row)
        pdf = spark.createDataFrame(rows)
        path = root / f"ano={d.year}" / f"mes={d.month:02d}" / f"dia={d.day:02d}"
        pdf.coalesce(1).write.mode("overwrite").parquet(str(path))
    return str(root)


def test_read_raw_canonicalizes_drift(spark, raw_zone):
    df = b3.read_raw(spark, raw_zone)
    assert df.count() == 60  # 10 days × 6 tickers
    assert "valor_limpo" not in df.columns
    assert dict(df.dtypes)["data_hora"] == "timestamp"
    # v0 partitions (days 1-2) → null data_hora; v1 partitions → parsed
    assert df.filter(F.col("data_hora").isNull()).count() == 12
    assert df.filter(F.col("dia") == 5).select("data_hora").first()[0] is not None


def test_a1_intended_semantics_golden(spark, raw_zone):
    """Intended semantics with injected clock: only the last 8 calendar
    days (BETWEEN run_date-7 AND run_date) contribute to the sum."""
    run_date = dt.date(2025, 8, 10)  # day index 9
    out = b3.top5_7day_sum(
        b3.read_raw(spark, raw_zone), run_date=run_date, semantics="intended"
    ).collect()
    assert len(out) == 5
    # golden: days 2..9 are in [run_date-7, run_date] → 8 days
    days_in = range(2, 10)
    expect = {
        cod: sum(_qt(day, i) for day in days_in)
        for i, (cod, _, _) in enumerate(TICKERS)
    }
    got = {r.cod: r[b3.TOTAL_COL] for r in out}
    for cod, total in got.items():
        assert total == expect[cod], cod
    # top-5 by total DESC: ticker index 5 has the highest per-day qt
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(got) == [cod for cod, _ in ranked] or set(got) == {c for c, _ in ranked}


def test_a1_reference_semantics_sums_everything(spark, raw_zone):
    """Reference semantics: read-time stamp makes the 7-day filter
    vacuous — the sum covers ALL landed partitions (SURVEY §3.2)."""
    out = b3.top5_7day_sum(
        b3.read_raw(spark, raw_zone), semantics="reference"
    ).collect()
    expect_all = {
        cod: sum(_qt(day, i) for day in range(10))
        for i, (cod, _, _) in enumerate(TICKERS)
    }
    for r in out:
        assert r[b3.TOTAL_COL] == expect_all[r.cod]


def test_refined_write_layout_and_catalog(spark, raw_zone, tmp_path):
    refined_path = str(tmp_path / "refined")
    out = b3.run(
        spark, raw_zone, refined_path, run_date=dt.date(2025, 8, 10)
    )
    assert out.columns == ["cod", "acao", b3.TOTAL_COL, "created_at"]
    back = spark.read.parquet(refined_path)
    assert back.count() == 5
    assert {"acao", "created_at"} <= set(back.columns)
    # Hive layout: partition dirs by acao then created_at
    acao_dirs = [p.name for p in (tmp_path / "refined").iterdir() if p.is_dir()]
    assert all(p.startswith("acao=") for p in acao_dirs)

    # K3/D4: same frame registered as a catalog table
    create_database(spark, "tech_fiap")
    save_as_table(out, "tech_fiap.b3_fiap", partition_by=["acao", "created_at"],
                  mode="overwrite")
    assert spark.table("tech_fiap.b3_fiap").count() == 5


def test_clean_chain_f3(spark):
    """F3 → F1: footer filter, ptBR separator strip, null-on-cast,
    /1000 rescale, bulk rename."""
    rows = [
        ("AAAA3", "ALPHA SA", "ON NM", "4.394.835.131", 494),
        ("BBBB4", "BETA S/A", "PN N1", "1.234.567", 2795),
        ("Redutor", "—", "—", "nao numerico", 0),
        ("Quantidade Teórica Total", "—", "—", "99.999.999.999", 0),
    ]
    df = spark.createDataFrame(
        rows, ["Código", "Ação", "Tipo", "Qtde. Teórica", "Part. (%)"]
    )
    got = clean_b3(df).orderBy("cod").collect()
    assert [r.cod for r in got] == ["AAAA3", "BBBB4"]
    assert got[0].qtde_teorica == 4394835131
    assert got[0].part_teorica_porc == 0.494
    assert got[1].qtde_teorica == 1234567
    assert got[1].part_teorica_porc == 2.795
    assert got[0].acao == "ALPHA SA" and got[1].tipo == "PN N1"


def test_clean_chain_null_on_bad_cast(spark):
    df = spark.createDataFrame(
        [("XXXX3", "X", "ON", "not-a-number", 100)],
        ["Código", "Ação", "Tipo", "Qtde. Teórica", "Part. (%)"],
    )
    assert clean_b3(df).first().qtde_teorica is None


def test_btc_batch_pipeline(spark, tmp_path):
    """F5: autoincrement-id emulation, daily partitioned write, ordered
    read-back (S6/O2/K2)."""
    rows = [
        ("2025-07-31 23:52:19.088260", 649034.0),
        ("2025-08-01 00:10:00.000000", 650000.5),
        ("2025-08-01 08:00:00.500000", 648500.25),
    ]
    ticks = spark.createDataFrame(rows, ["data_hora", "preco_brl"])
    with_ids = btc.assign_ids(ticks)
    got = with_ids.orderBy("id").collect()
    assert [r.id for r in got] == [1, 2, 3]
    assert got[0].preco_brl == 649034.0  # id follows ingestion-time order

    out = str(tmp_path / "ticks")
    btc.write_ticks(with_ids, out)
    assert (tmp_path / "ticks" / "ano=2025" / "mes=7" / "dia=31").exists()
    assert (tmp_path / "ticks" / "ano=2025" / "mes=8" / "dia=1").exists()
    back = spark.read.parquet(out)
    assert back.count() == 3

    latest = btc.latest_price(with_ids).first()
    assert latest.id == 3 and latest.preco_brl == 648500.25


def test_update_table_k6(spark, tmp_path):
    """K6: UPDATE ... SET data_hora = <yesterday> WHERE data_hora IS NULL
    as an atomic snapshot rewrite (reference src/query_db.py:36-43)."""
    path = str(tmp_path / "pregao")
    spark.createDataFrame(
        [("AAAA3", "2025-08-01 18:00:00"), ("BBBB4", None), ("CCCC3", None)],
        ["cod", "data_hora"],
    ).write.parquet(path)

    n = update_table(
        spark,
        path,
        {"data_hora": F.lit("2025-08-09 00:00:00")},
        F.col("data_hora").isNull(),
    )
    assert n == 2
    back = spark.read.parquet(path)
    assert back.filter(F.col("data_hora").isNull()).count() == 0
    assert back.filter(F.col("data_hora") == "2025-08-09 00:00:00").count() == 2
    assert back.filter(F.col("cod") == "AAAA3").first().data_hora == "2025-08-01 18:00:00"

    # no-op predicate → nothing rewritten
    assert update_table(spark, path, {"data_hora": F.lit("x")}, F.lit(False)) == 0


def test_update_table_partitioned(spark, tmp_path):
    """Partition-scoped K6: only partitions containing matched rows are
    rewritten (the 100 TB-safe path)."""
    path = str(tmp_path / "part_tbl")
    spark.createDataFrame(
        [("a", 1, None), ("a", 2, "x"), ("b", 3, "y")],
        ["grp", "id", "val"],
    ).write.partitionBy("grp").parquet(path)

    n = update_table(
        spark, path, {"val": F.lit("filled")}, F.col("val").isNull(),
        partition_by=["grp"],
    )
    assert n == 1
    back = spark.read.parquet(path)
    assert back.count() == 3
    assert back.filter(F.col("val") == "filled").count() == 1
    assert back.filter(F.col("grp") == "b").first().val == "y"


def test_create_table_if_not_exists(spark):
    create_database(spark, "tech_fiap")
    create_table_if_not_exists(
        spark, "tech_fiap.preco_bitcoin",
        "id BIGINT, data_hora STRING, preco_brl DOUBLE",
    )
    # idempotent (IF NOT EXISTS)
    create_table_if_not_exists(
        spark, "tech_fiap.preco_bitcoin",
        "id BIGINT, data_hora STRING, preco_brl DOUBLE",
    )
    assert spark.catalog.tableExists("tech_fiap.preco_bitcoin")


def test_multimodal_frame_sample(spark):
    """Frame sampling fans 1 payload row out to duration/step frame rows
    with non-overlapping byte slices (multimodal mapInPandas plumbing)."""
    from aws_etl_project2_fiap_spark.operators.multimodal import (
        attach_binary,
        frame_sample,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 100), (2, "y" * 10)], ["doc_id", "payload"]
    )
    media = attach_binary(docs, "payload", kind="video")
    # duration_ms = n_bytes * 10 → doc1: 1000ms → 1 frame at default 1000ms;
    # sample every 100ms → doc1: 10 frames, doc2: 1 frame
    frames = frame_sample(media, every_ms=100)
    rows = frames.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 10
    assert len(by_doc[2]) == 1
    f0 = sorted(by_doc[1], key=lambda r: r.frame_idx)
    assert [r.frame_ms for r in f0] == [i * 100 for i in range(10)]
    assert b"".join(bytes(r.frame_bytes) for r in f0) == b"x" * 100


def test_rolling_chunks_shift_tolerant(spark):
    """Content-defined chunking realigns after an insertion: a doc with
    a prepended sentence shares most chunk hashes with the original
    (fixed-offset shingles would share none)."""
    from aws_etl_project2_fiap_spark.operators.text import rolling_chunk_hashes

    body = (
        "the quick brown fox jumps over the lazy dog while the analytics "
        "engine shuffles partitions and broadcasts dimensions across the "
        "cluster every single micro batch window interval "
    ) * 4
    docs = spark.createDataFrame(
        [(1, body), (2, "INSERTED PREFIX CHANGES OFFSETS " + body)],
        ["doc_id", "text"],
    )
    rows = rolling_chunk_hashes(docs).collect()
    h1 = {r.chunk_hash for r in rows if r.id == 1}
    h2 = {r.chunk_hash for r in rows if r.id == 2}
    assert len(h1) > 3  # actually chunked, not one blob
    overlap = len(h1 & h2) / len(h1)
    assert overlap >= 0.7, (overlap, len(h1), len(h2))
    # determinism
    again = {r.chunk_hash for r in rolling_chunk_hashes(docs).collect() if r.id == 1}
    assert again == h1


def test_merge_into_upsert(spark, tmp_path):
    """MERGE INTO: matched keys update, new keys insert, others persist."""
    from aws_etl_project2_fiap_spark.io.update import merge_into

    path = str(tmp_path / "tgt")
    spark.createDataFrame(
        [("AAAA3", 100, "old"), ("BBBB4", 200, "old")],
        ["cod", "qt", "tag"],
    ).write.parquet(path)
    source = spark.createDataFrame(
        [("BBBB4", 999, "new"), ("CCCC3", 300, "new")],
        ["cod", "qt", "tag"],
    )
    stats = merge_into(spark, path, source, ["cod"])
    assert stats == {"updated": 1, "inserted": 1}
    back = {r.cod: (r.qt, r.tag) for r in spark.read.parquet(path).collect()}
    assert back == {
        "AAAA3": (100, "old"),
        "BBBB4": (999, "new"),
        "CCCC3": (300, "new"),
    }

    # when_matched="ignore": existing rows win
    source2 = spark.createDataFrame([("AAAA3", 555, "x")], ["cod", "qt", "tag"])
    stats2 = merge_into(spark, path, source2, ["cod"], when_matched="ignore")
    assert stats2["updated"] == 1  # matched, but kept
    assert spark.read.parquet(path).filter(F.col("cod") == "AAAA3").first().qt == 100


def test_streaming_upsert_sink(spark, tmp_path):
    """foreachBatch upsert: late tick replaces the same-key row instead
    of appending a duplicate."""
    from aws_etl_project2_fiap_spark.streaming.sinks import upsert_sink
    from aws_etl_project2_fiap_spark.streaming.sources import TICK_SCHEMA
    from aws_etl_project2_fiap_spark.streaming import file_source

    landing = str(tmp_path / "landing")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [("2025-08-01 10:00:00", 100.0), ("2025-08-01 11:00:00", 110.0)],
        ["s", "preco_brl"],
    ).select(F.to_timestamp("s").alias("data_hora"), "preco_brl").coalesce(
        1
    ).write.mode("append").parquet(landing)
    upsert_sink(
        file_source(spark, landing, TICK_SCHEMA), target, ["data_hora"], ckpt
    ).awaitTermination()
    assert spark.read.parquet(target).count() == 2

    # correction arrives for 10:00 + one new tick
    spark.createDataFrame(
        [("2025-08-01 10:00:00", 999.0), ("2025-08-01 12:00:00", 120.0)],
        ["s", "preco_brl"],
    ).select(F.to_timestamp("s").alias("data_hora"), "preco_brl").coalesce(
        1
    ).write.mode("append").parquet(landing)
    upsert_sink(
        file_source(spark, landing, TICK_SCHEMA), target, ["data_hora"], ckpt
    ).awaitTermination()
    back = spark.read.parquet(target)
    assert back.count() == 3  # upsert, not append
    assert (
        back.filter(F.col("data_hora") == "2025-08-01 10:00:00").first().preco_brl
        == 999.0
    )


def test_marker_hits_counts_adjacent_runs(spark):
    """'the the the' must count 3 (the old space-padded replace trick
    undercounted adjacent occurrences)."""
    from aws_etl_project2_fiap_spark.operators.text import marker_hits

    df = spark.createDataFrame(
        [("the the the",), ("the cat the",), ("lathe theory",)], ["text"]
    )
    got = [r.n for r in df.select(marker_hits("text", "the").alias("n")).collect()]
    assert got == [3, 2, 0]  # word-bounded: no hits inside lathe/theory


def test_merge_into_rejects_duplicate_source_keys(spark, tmp_path):
    from aws_etl_project2_fiap_spark.io.update import merge_into

    path = str(tmp_path / "t")
    spark.createDataFrame([("a", 1)], ["k", "v"]).write.parquet(path)
    dup_source = spark.createDataFrame([("a", 2), ("a", 3)], ["k", "v"])
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_into(spark, path, dup_source, ["k"])


def test_upsert_sink_keep_latest_within_batch(spark, tmp_path):
    """With order_col, the newest row per key wins INSIDE one batch."""
    from aws_etl_project2_fiap_spark.streaming import file_source
    from aws_etl_project2_fiap_spark.streaming.sinks import upsert_sink
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    landing = str(tmp_path / "landing")
    spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 99.0), ("b", 1, 5.0)], schema
    ).coalesce(1).write.parquet(landing)
    upsert_sink(
        file_source(spark, landing, schema),
        str(tmp_path / "target"),
        ["k"],
        str(tmp_path / "ckpt"),
        order_col="seq",
    ).awaitTermination()
    back = {r.k: r.v for r in spark.read.parquet(str(tmp_path / "target")).collect()}
    assert back == {"a": 99.0, "b": 5.0}


def test_simhash_near_dup_pairs(spark):
    """Docs differing by one token land within the Hamming threshold and
    are found through pigeonhole block-join; unrelated docs are not."""
    from aws_etl_project2_fiap_spark.operators.dedup import simhash_near_dup_pairs

    base = (
        "spark shuffles partitions across the cluster while the optimizer "
        "prunes columns and pushes filters into the parquet scan layer "
    ) * 3
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + "extra"),  # tiny perturbation
            (3, "completely different words about cooking pasta and sauce "
                "with tomatoes basil garlic and olive oil in a big pot"),
        ],
        ["doc_id", "text"],
    )
    got = {(r.id1, r.id2): r.hamming for r in simhash_near_dup_pairs(docs, max_hamming=6, blocks=8).collect()}
    assert (1, 2) in got
    assert got[(1, 2)] <= 6
    assert (1, 3) not in got and (2, 3) not in got
    import pytest as _pytest
    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(docs, max_hamming=4, blocks=4)


def test_asof_join_forward_and_tolerance(spark):
    from aws_etl_project2_fiap_spark.operators.asof import asof_join

    probes = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 250)], ["pid", "k", "ts"]
    )
    quotes = spark.createDataFrame(
        [("u", 90, 9.0), ("u", 110, 11.0), ("u", 500, 50.0)], ["k", "qts", "val"]
    )
    fwd = {
        r.pid: r.val_asof
        for r in asof_join(
            probes, quotes, ["k"], "ts", "qts", ["val"], direction="forward"
        ).collect()
    }
    assert fwd == {1: 11.0, 2: 50.0}  # next-upcoming quote

    bwd_tol = {
        r.pid: r.val_asof
        for r in asof_join(
            probes, quotes, ["k"], "ts", "qts", ["val"], tolerance=20
        ).collect()
    }
    assert bwd_tol == {1: 9.0, 2: None}  # 250-110=140 > 20 → null

    import pytest as _pytest
    with _pytest.raises(ValueError, match="direction"):
        asof_join(probes, quotes, ["k"], "ts", "qts", ["val"], direction="nearest")


def test_multimodal_resize_plumbing(spark):
    """resize(): output payloads are exactly width*height bytes, the
    metadata struct reflects the new dimensions, byte sampling is
    deterministic, and the stage composes (resize -> extract_features
    runs on the resized payloads)."""
    from pyspark.sql import functions as F

    from aws_etl_project2_fiap_spark.operators.multimodal import (
        attach_binary,
        extract_features,
        resize,
    )

    d = spark.createDataFrame(
        [(1, "x" * 503), (2, "hello world, a short payload"), (3, "")],
        ["doc_id", "text"],
    )
    media = attach_binary(d, "text")
    small = resize(media, width=16, height=8)
    rows = {r.doc_id: r for r in small.collect()}
    assert all(len(rows[i].content) == 16 * 8 for i in (1, 2, 3))
    assert all(
        (rows[i].media.width, rows[i].media.height) == (16, 8) for i in (1, 2, 3)
    )
    # deterministic: same input -> same sampled bytes
    again = {r.doc_id: r for r in resize(media, width=16, height=8).collect()}
    assert all(rows[i].content == again[i].content for i in (1, 2, 3))
    # composes with the feature stage on the RESIZED payloads
    feats = extract_features(small)
    assert {r.n_bytes for r in feats.collect()} == {128}


def test_multimodal_arrow_path_equals_pandas_path(spark):
    """extract_features_arrow (mapInArrow, RecordBatch-level) must be
    row-identical to extract_features (mapInPandas) — same fake codec,
    one less conversion layer."""
    from aws_etl_project2_fiap_spark.operators.multimodal import (
        attach_binary,
        extract_features,
        extract_features_arrow,
    )

    d = attach_binary(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text"
    )
    via_pandas = {
        r.doc_id: (r.n_bytes, r.checksum, tuple(r.feature))
        for r in extract_features(d).collect()
    }
    via_arrow = {
        r.doc_id: (r.n_bytes, r.checksum, tuple(r.feature))
        for r in extract_features_arrow(d).collect()
    }
    assert via_arrow == via_pandas and len(via_arrow) > 0
