"""bench.py is driver-critical: if it crashes or prints malformed
JSON, the round records no performance numbers at all. Two gates:

1. a free referential check — every HEADLINE / sf1 name must exist in
   the workload registries (catches renames instantly);
2. a real end-to-end run at sf0.001 with rechunking disabled — the
   exact invocation the round driver makes, just on the smallest SF.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_headline_names_resolve():
    sys.path.insert(0, REPO)
    import bench

    from aws_etl_project2_fiap_spark.workload import CATALOG, COMPONENTS

    defs = {**CATALOG, **COMPONENTS}
    missing = [n for n in bench.HEADLINE if n not in defs]
    assert not missing, f"HEADLINE names not in workload: {missing}"
    # the sf1 column's names too: a rename must fail HERE, not at the
    # driver bench's last column (the smoke run below opts out of sf1)
    missing_sf1 = [n for n in bench.SF1_SET if n not in defs]
    assert not missing_sf1, f"SF1_SET names not in workload: {missing_sf1}"
    # every gated name is actually timed: a baseline for a query that
    # left the set would silently stop gating it
    assert set(bench.SF1_BASELINE) <= set(bench.SF1_SET)


def test_sf1_payload_contract_is_total(tmp_path):
    """VERDICT r8 #1: the payload can never be silent about sf1 — the
    code paths all end in sf1_queries_steady+fingerprint or an
    explicit sf1_skipped marker. Branch coverage runs against a
    tmp_path tiled dir with an injected stub builder (ADVICE r9: the
    unit suite must not shell out to the real ~2 min tiler or mutate
    /tmp). Plus the fingerprint is deterministic and moves with the
    source."""
    sys.path.insert(0, REPO)
    import bench

    fp1 = bench._sf1_source_fingerprint()
    fp2 = bench._sf1_source_fingerprint()
    assert fp1 == fp2 and len(fp1) == 16

    tiled = str(tmp_path / "tiled_sf1")

    def full_build():
        os.makedirs(tiled, exist_ok=True)
        for t in bench._SF1_TABLES:
            with open(os.path.join(tiled, f"{t}.parquet"), "w") as fh:
                fh.write("x")

    # 1. absent dir → builds, stamps the fingerprint, returns runnable
    payload = {}
    assert bench._ensure_tiled_sf1(tiled, payload, build=full_build)
    assert payload["sf1_built"] is True
    assert payload["sf1_source_fingerprint"] == fp1
    assert "sf1_skipped" not in payload
    with open(os.path.join(tiled, "_source_fingerprint.json")) as fh:
        assert json.load(fh)["fingerprint"] == fp1

    # 2. complete + fingerprint-fresh → runnable WITHOUT rebuilding
    def must_not_build():
        raise AssertionError("fresh cache must not rebuild")

    payload = {}
    assert bench._ensure_tiled_sf1(tiled, payload, build=must_not_build)
    assert "sf1_built" not in payload and "sf1_skipped" not in payload
    assert payload["sf1_source_fingerprint"] == fp1

    # 3. stale fingerprint → rebuild runs (sidecar says another source)
    with open(os.path.join(tiled, "_source_fingerprint.json"), "w") as fh:
        json.dump({"fingerprint": "someoneelse0000"}, fh)
    payload = {}
    assert bench._ensure_tiled_sf1(tiled, payload, build=full_build)
    assert payload["sf1_built"] is True

    # 4. builder exits clean but the dir is incomplete → LOUD skip,
    # no valid-looking fingerprint minted
    os.unlink(os.path.join(tiled, "lineitem.parquet"))
    os.unlink(os.path.join(tiled, "_source_fingerprint.json"))
    payload = {}
    assert not bench._ensure_tiled_sf1(
        tiled, payload, build=lambda: None
    )
    assert "incomplete" in payload["sf1_skipped"]
    assert "lineitem" in payload["sf1_skipped"]
    assert not os.path.exists(
        os.path.join(tiled, "_source_fingerprint.json")
    )

    # 5. builder crashes → LOUD skip with the reason
    def boom():
        raise OSError("no disk")

    payload = {}
    assert not bench._ensure_tiled_sf1(tiled, payload, build=boom)
    assert "no disk" in payload["sf1_skipped"]


def test_bench_emits_one_json_line_at_smallest_sf():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_RECHUNK="0",
        SPARK_GRAFT_CPUS="8",
        # the sf1 column would tile 10x data and bench it — out of
        # scope for this smallest-SF smoke; the explicit opt-out must
        # surface as a LOUD skip marker in the payload (asserted below)
        SPARK_GRAFT_SF1_BENCH="0",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    # the core line prints early and the payload re-emits after each
    # optional column joins (lakehouse verbs, sf1) — truncation-safe
    # capture contract, see bench.py docstring: every JSON line must
    # parse, each is a superset of the previous, and the LAST one is
    # the authoritative full payload
    assert 1 <= len(json_lines) <= 3, proc.stdout[-1000:]
    parsed = [json.loads(ln) for ln in json_lines]
    for earlier, later in zip(parsed, parsed[1:]):
        assert set(earlier) <= set(later)
    payload = parsed[-1]
    for key in ("metric", "value", "unit", "queries", "queries_steady", "sf"):
        assert key in payload, f"missing {key}"
    # the round-7 write-path column rides the default run — and every
    # PINNED lakehouse baseline must name a verb this run actually
    # timed (a renamed verb would otherwise silently stop being gated:
    # the violation comprehension filters on baseline membership)
    assert payload["lakehouse_verbs"] and payload["lakehouse_total"] > 0
    assert "lakehouse_gate_violations" in payload
    import bench as _b

    assert set(_b.LAKEHOUSE_BASELINE) <= set(payload["lakehouse_verbs"])
    # the sf1 contract is TOTAL (VERDICT r8 #1): either the gated
    # column ran, or the payload says loudly why not — here the env
    # opt-out above must surface as the explicit marker
    assert ("sf1_queries_steady" in payload) != ("sf1_skipped" in payload)
    assert payload["sf1_skipped"] == "disabled by SPARK_GRAFT_SF1_BENCH=0"
    assert payload["unit"] == "sec" and payload["value"] > 0
    import bench

    assert set(payload["queries"]) == set(bench.HEADLINE)
    assert all(v >= 0 for v in payload["queries"].values())
    # load-adjudication sentinel: fixed-work probe timed with each
    # column so a uniformly-inflated (co-tenant loaded) capture is
    # self-identifying in the artifact
    assert payload["sentinel"]["before_cold"] > 0
    assert payload["sentinel"]["after_steady"] > 0
    # the full payload also lands in a file (survives the driver's
    # fixed-size output-capture truncation)
    with open(payload["payload_file"]) as fh:
        assert json.loads(fh.read()) == payload
