"""AllPairs prefix-filter scale switch for exact shingle-Jaccard.

``SPARK_GRAFT_PREFIX_FILTER=1`` swaps `_exact_jaccard_pairs`'s
inverted-index self-join (candidate volume Σ_g df(g)² — fine here where
max df is 7, superlinear under a heavy-tail shingle distribution) for
Bayardo/Ma/Srikant WWW'07 prefix filtering: rare-first global shingle
order, per-doc prefix of length n − ⌈t·n⌉ + 1, length filter, exact
array_intersect verify. These tests pin:

1. bit-identical output on the real corpus at two thresholds;
2. bit-identical output on a crafted stop-shingle corpus — the regime
   the switch exists for — including a pair sitting EXACTLY at the
   threshold (the ⌈t·n⌉ float-slack hazard) and an n=5/t=0.8 case
   (0.8*5 is not exactly 4.0 in binary; the 1e-9 slack must keep the
   prefix long enough);
3. the prefix path never joins on the stop-shingle: every candidate
   pair it considers shares a RARE shingle (asserted structurally — the
   stop-shingle-only pair is absent from the output both ways because
   its true Jaccard is below threshold, and present in neither).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cloud2sql_spark.queries.extensions import (
    _doc_shingles,
    _exact_jaccard_pairs,
)


def _rows(df):
    return sorted(
        (r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in df.collect()
    )


@pytest.mark.parametrize("thr", [0.5, 0.8])
def test_prefix_filter_matches_default_on_real_corpus(
    spark, sf_dir, monkeypatch, thr
):
    sh = _doc_shingles(spark, sf_dir, nonempty=True)
    base = _rows(_exact_jaccard_pairs(sh, thr))
    monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", "1")
    pref = _rows(_exact_jaccard_pairs(sh, thr))
    assert pref == base
    assert len(base) > 0  # the corpus has planted near-dups


def _crafted(spark):
    """Corpus where ONE shingle ('the quick fox') appears in every doc
    (df = n_docs — the stop-shingle regime), rare shingles carry the
    real similarity, and one pair sits exactly at J = 0.5."""
    docs = [
        # near-dup pair: inter=3 (stop+r1+r2), union=5 → J = 0.6 — an
        # exact-boundary row for the t=0.6 parametrization
        (1, ["the quick fox", "r1 a a", "r2 b b", "u1 x x"]),
        (2, ["the quick fox", "r1 a a", "r2 b b", "u2 y y"]),
        # exact-boundary pair: inter=2 (stop + r3), union=4 → J = 0.5
        (3, ["the quick fox", "r3 c c", "u3 z z"]),
        (4, ["the quick fox", "r3 c c", "u4 w w"]),
        # stop-shingle-only pair members: J = 1/5 with everything
        (5, ["the quick fox", "u5 p p", "u6 q q"]),
        (6, ["the quick fox", "u7 s s", "u8 t t"]),
        # n=5 doc pair for the t=0.8 float hazard: inter=4, union=6 →
        # J=0.667 (below 0.8, above 0.5); at t=0.5 plen must keep a
        # shared shingle in both prefixes
        (7, ["the quick fox", "r4 d d", "r5 e e", "r6 f f", "u9 g g"]),
        (8, ["the quick fox", "r4 d d", "r5 e e", "r6 f f", "v0 h h"]),
    ]
    return spark.createDataFrame(docs, "doc_id BIGINT, sg ARRAY<STRING>")


@pytest.mark.parametrize("thr", [0.5, 0.6, 0.8])
def test_prefix_filter_matches_default_on_stop_shingle_corpus(
    spark, monkeypatch, thr
):
    sh = _crafted(spark)
    base = _rows(_exact_jaccard_pairs(sh, thr))
    monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", "1")
    pref = _rows(_exact_jaccard_pairs(sh, thr))
    assert pref == base


def test_boundary_pair_survives_prefix_filter(spark, monkeypatch):
    """The J = 0.5 pair (docs 3,4) must survive at t = 0.5 on BOTH
    paths — the ⌈t·n⌉ slack and the ≥ (not >) comparisons are exactly
    for this row."""
    sh = _crafted(spark)
    for flag in ("", "1"):
        monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", flag)
        got = _rows(_exact_jaccard_pairs(sh, 0.5))
        assert (3, 4, 0.5) in got, f"flag={flag!r}: {got}"
        # the stop-shingle-only pair (5,6): J = 1/5 — out on both paths
        assert not any(p[:2] == (5, 6) for p in got)


def test_prefix_plan_shape(spark, sf_dir, monkeypatch):
    """Plan pins for both paths of the registered operator: the default
    inverted-index plan has no per-doc rank window; the prefix plan
    adds exactly the doc_id-partitioned row_number window plus the
    candidate/verify joins — and neither path ever degenerates to a
    cartesian or nested-loop join."""
    from cloud2sql_spark.registry import queries

    fn = queries()["dedup_ngram_jaccard"]

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    monkeypatch.delenv("SPARK_GRAFT_PREFIX_FILTER", raising=False)
    default = plan(fn(spark, sf_dir))
    assert "Window" not in default, default
    monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", "1")
    pref = plan(fn(spark, sf_dir))
    assert "Window" in pref, pref
    assert "row_number" in pref, pref
    for p in (default, pref):
        assert "CartesianProduct" not in p, p
        assert "BroadcastNestedLoopJoin" not in p, p


def test_low_threshold_full_prefix_equivalence(spark, monkeypatch):
    """At t = 0.1 the prefix length n − ⌈t·n⌉ + 1 equals n for every
    crafted doc — the prefix degenerates to the whole set and the two
    plans must agree on the ENTIRE pair space (every crafted pair
    shares the stop-shingle, so all 28 pairs clear J ≥ 0.1). This pins
    the plen formula at the low-threshold edge; the t = 0.5/0.6 cases
    above pin the short-prefix regime where the stop-shingle (df = 8,
    last in every doc's rare-first order) falls outside every prefix."""
    sh = _crafted(spark)
    base = _rows(_exact_jaccard_pairs(sh, 0.1))
    monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", "1")
    pref = _rows(_exact_jaccard_pairs(sh, 0.1))
    assert pref == base
    assert any(p[:2] == (5, 6) for p in base)  # found via stop-shingle


# ---------------------------------------------------------- containment

def _containment_rows(spark, sf_dir):
    from cloud2sql_spark.registry import queries

    return sorted(
        (r.doc_a, r.doc_b, round(r.containment, 9))
        for r in queries()["dedup_containment"](spark, sf_dir).collect()
    )


@pytest.fixture(scope="module")
def containment_corpus(tmp_path_factory):
    """Heavy-tail corpus for the containment prefix path: a stop
    shingle (df 30+, above the cap) shared by filler docs, a fully
    CONTAINED doc (C = 1.0 against a 5x larger container — the
    asymmetric case Jaccard prefix filtering cannot express), a pair
    sitting EXACTLY at C = 0.8 on the smaller side (n=5, inter=4 — the
    ⌈t·n⌉ float-slack hazard), and an equal-size pair at C = 0.8 (the
    n-tie doc_id tie-break branch of the asymmetric join)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = {
        # container: 50 unique words -> 48 unique trigrams
        1: " ".join(f"w{i}" for i in range(50)),
        # contained: its first 10 words -> 8 trigrams, all in doc 1
        2: " ".join(f"w{i}" for i in range(10)),
        # boundary pair: doc 3 has 5 trigrams; doc 4 shares 4 of them
        # (bridging trigrams past p6 are doc-4-only) -> C(3,4) = 0.8
        3: "p1 p2 p3 p4 p5 p6 p7",
        4: "p1 p2 p3 p4 p5 p6 x1 x2 x3 x4",
        # equal-size pair: both 7 words / 5 trigrams, sharing 4 -> 0.8
        5: "q1 q2 q3 q4 q5 q6 q7",
        6: "q1 q2 q3 q4 q5 q6 r1",
    }
    # stop-shingle fillers: every one carries 'aa bb cc' (df = 30,
    # above the rare cap) plus unique words; pairwise they share ONLY
    # stop/bridge shingles
    for i in range(30):
        texts[100 + i] = f"aa bb cc f{i}a f{i}b f{i}c"
    d = str(tmp_path_factory.mktemp("containment_corpus"))
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids]),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["crafted"] * len(ids)),
                "n_chars": pa.array(
                    [len(texts[i]) for i in ids], pa.int64()
                ),
            }
        ),
        f"{d}/documents.parquet",
    )
    return d


def test_containment_prefix_matches_default_on_real_corpus(
    spark, sf_dir, monkeypatch
):
    monkeypatch.delenv("SPARK_GRAFT_PREFIX_FILTER", raising=False)
    base = _containment_rows(spark, sf_dir)
    monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", "1")
    pref = _containment_rows(spark, sf_dir)
    assert pref == base
    assert len(base) > 0  # planted near-dups contain each other


def test_containment_prefix_matches_default_on_heavy_tail(
    spark, containment_corpus, monkeypatch
):
    monkeypatch.delenv("SPARK_GRAFT_PREFIX_FILTER", raising=False)
    base = _containment_rows(spark, containment_corpus)
    monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", "1")
    pref = _containment_rows(spark, containment_corpus)
    assert pref == base
    got = {p[:2] for p in base}
    # the contained doc, the exact-boundary pair, and the size-tie pair
    # are all found; stop-shingle-only filler pairs are not
    assert (1, 2) in got
    assert (3, 4) in got and any(
        p[:2] == (3, 4) and p[2] == 0.8 for p in base
    )
    assert (5, 6) in got
    assert not any(a >= 100 and b >= 100 for a, b in got)


def test_containment_prefix_plan_has_no_posting_arrays(
    spark, sf_dir, monkeypatch
):
    """The flagged plan must really retire the posting-list build: no
    collect_list aggregate anywhere (df comes from a plain count), a
    per-doc rank window appears, and neither path degenerates to a
    cartesian/nested-loop join."""
    from cloud2sql_spark.registry import queries

    fn = queries()["dedup_containment"]

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    monkeypatch.delenv("SPARK_GRAFT_PREFIX_FILTER", raising=False)
    default = plan(fn(spark, sf_dir))
    assert "collect_list" in default, default
    monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", "1")
    pref = plan(fn(spark, sf_dir))
    assert "collect_list" not in pref, pref
    assert "row_number" in pref, pref
    for p in (default, pref):
        assert "CartesianProduct" not in p, p
        assert "BroadcastNestedLoopJoin" not in p, p


# ------------------------------------------------- capped family (sr meta)

def _capped_rows(spark, sf_dir):
    from cloud2sql_spark.registry import queries

    return sorted(
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in queries()["dedup_ngram_capped"](spark, sf_dir).collect()
    )


def test_capped_flag_matches_default_on_real_corpus(
    spark, sf_dir, monkeypatch
):
    """The flagged _capped_sr_meta (rare-token self-join, no posting
    arrays) must produce the identical sr frame and hence identical
    dedup_ngram_capped output."""
    monkeypatch.delenv("SPARK_GRAFT_PREFIX_FILTER", raising=False)
    base = _capped_rows(spark, sf_dir)
    monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", "1")
    pref = _capped_rows(spark, sf_dir)
    assert pref == base
    assert len(base) > 0


def test_capped_flag_matches_default_on_heavy_tail(
    spark, containment_corpus, monkeypatch
):
    monkeypatch.delenv("SPARK_GRAFT_PREFIX_FILTER", raising=False)
    base = _capped_rows(spark, containment_corpus)
    monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", "1")
    pref = _capped_rows(spark, containment_corpus)
    assert pref == base


def test_capped_flag_plan_has_no_posting_arrays(spark, sf_dir, monkeypatch):
    from cloud2sql_spark.registry import queries

    fn = queries()["dedup_ngram_capped"]

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    monkeypatch.delenv("SPARK_GRAFT_PREFIX_FILTER", raising=False)
    assert "collect_list" in plan(fn(spark, sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", "1")
    pref = plan(fn(spark, sf_dir))
    assert "collect_list" not in pref, pref
    assert "CartesianProduct" not in pref, pref


def test_cluster_cc_flag_matches_default(spark, sf_dir, monkeypatch):
    """dedup_cluster_cc consumes the capped pair list; the flagged
    candidate generation must leave its clustering untouched."""
    from cloud2sql_spark.registry import queries

    fn = queries()["dedup_cluster_cc"]

    def rows(df):
        return sorted(
            (r.doc_id, r.cluster_id, r.cluster_size) for r in df.collect()
        )

    monkeypatch.delenv("SPARK_GRAFT_PREFIX_FILTER", raising=False)
    base = rows(fn(spark, sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_PREFIX_FILTER", "1")
    pref = rows(fn(spark, sf_dir))
    assert pref == base
    assert len(base) > 0
