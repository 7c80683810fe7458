"""Exact duplicate-span removal (operators/text.span_dedup).

Ground truth is a sequential pure-Python reference of the ExactSubstr
semantics (Lee et al. 2022, token granularity): every k-token shingle
occurring more than once keeps only its globally-first occurrence (min
(doc, pos)); later occurrences mark [pos, pos+k) for removal; marked
ranges union per doc; docs reassemble from surviving tokens.
"""

import pytest
from pyspark.sql import functions as F

from aws_etl_project2_fiap_spark.operators.text import span_dedup


def _ref(docs, k):
    toks = {i: [t for t in s.split(" ") if t] for i, s in docs}
    occ = {}
    for i, _ in docs:
        t = toks[i]
        for p in range(max(len(t) - k + 1, 0)):
            occ.setdefault(" ".join(t[p : p + k]), []).append((i, p))
    removed = {i: set() for i, _ in docs}
    for lst in occ.values():
        if len(lst) <= 1:
            continue
        first = min(lst)
        for (i, p) in lst:
            if (i, p) != first:
                removed[i].update(range(p, p + k))
    out = {}
    for i, _ in docs:
        t = toks[i]
        keep = [t[j] for j in range(len(t)) if j not in removed[i]]
        out[i] = (" ".join(keep), len(t) - len(keep))
    return out


def _run(spark, docs, k):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in span_dedup(df, k=k).collect()
    }


CORPUS = [
    (1, "a b c d e f g h i j"),
    (2, "x x a b c d e f g h END tail"),  # interior dup of doc 1
    (3, "a b c d e f g h i j"),  # whole-doc duplicate
    (4, "short doc"),  # shorter than k
    (5, ""),  # empty
    (6, "q w e r t y u i o p"),  # unique
    (7, "m a b c d z z a b c d e"),  # overlapping dup spans
]


def test_matches_sequential_reference(spark):
    assert _run(spark, CORPUS, 4) == _ref(CORPUS, 4)


def test_every_doc_returned_once(spark):
    got = _run(spark, CORPUS, 4)
    assert sorted(got) == [d for d, _ in CORPUS]


def test_first_occurrence_untouched_full_dup_emptied(spark):
    got = _run(spark, CORPUS, 10)
    assert got[1] == ("a b c d e f g h i j", 0)  # first wins
    assert got[3] == ("", 10)  # exact whole-doc dup vanishes


def test_short_and_empty_docs_pass_through(spark):
    got = _run(spark, CORPUS, 4)
    assert got[4] == ("short doc", 0)
    assert got[5] == ("", 0)


def test_overlapping_spans_union_not_double_count(spark):
    # doc 7 repeats "a b c d" at pos 1 and 7 (doc-internal dup): the
    # second occurrence [7, 11) is removed once even though multiple
    # overlapping shingles cover it
    got = _run(spark, [(7, "m a b c d z z a b c d e")], 4)
    ref = _ref([(7, "m a b c d z z a b c d e")], 4)
    assert got == ref
    assert got[7][1] == 4


def test_whitespace_runs_collapse_deterministically(spark):
    docs = [(1, "a  b   c d e"), (2, "a b c d e")]
    got = _run(spark, docs, 5)
    # token streams are identical after empty-token filtering, so doc 2
    # is a full duplicate of doc 1
    assert got[1] == ("a b c d e", 0)
    assert got[2] == ("", 5)


@pytest.mark.parametrize("k", [2, 3, 5, 8])
def test_reference_agreement_random_corpus(spark, k):
    import random

    rng = random.Random(20260815 + k)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → many collisions
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(40)
    ]
    assert _run(spark, docs, k) == _ref(docs, k)


def test_plan_partial_agg_and_no_python(spark):
    """The first-occurrence choice must partial-aggregate map-side
    (hot boilerplate shingles combine before the exchange) and the
    whole operator must stay JVM-side."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    p = span_dedup(df, k=4)._sc._jvm.PythonSQLUtils.explainString(
        span_dedup(df, k=4)._jdf.queryExecution(), "formatted"
    )
    assert "partial_min" in p or "partial" in p.lower()
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p
