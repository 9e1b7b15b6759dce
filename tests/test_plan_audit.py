"""Physical-plan audits: no row-at-a-time Python anywhere in the engine,
filters pushed to the parquet scan, projections pruned at the scan.

SURVEY.md §7 hard part (d) and the BASELINE.json input_hint's "no per-row
Python" rule, made executable. Reference analog: TestVectorizationProvider
asserting the vectorized dispatch is actually taken
(jvector-tests/.../vector/TestVectorizationProvider.java:34-101).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jvector_spark.plans import assert_no_row_python, plan_audit

SF_DIR = "/root/testdata/sf0.001"

# every driver-contract entry whose plan we can build cheaply (those that
# need a pre-built posting index build one over the tiny sf0.001 corpus via
# the entry module's own cache)
CHEAP_KEYS = [
    "doc_ids", "tokenize", "term_freq", "doc_stats", "dictionary",
    "bm25_score", "bm25_topk_bruteforce", "boolean_and", "boolean_or",
    "filter_topk", "phrase_count", "token_positions", "exact_dedup",
    "minhash_signatures", "minhash_near_dups", "jaccard_pairs", "simhash",
    "lang_id", "quality_score", "token_count", "doc_fingerprint",
    "media_meta", "media_features", "frame_sample", "embedding_near_dups",
    "embedding_near_dups_lsh", "ann_topk", "ann_topk_lsh", "ann_topk_sq8",
    "ann_topk_pq", "ann_topk_batch", "ann_topk_sq8_batch",
    "ann_topk_bq", "ann_topk_bq_batch", "ann_topk_nvq", "ann_topk_nvq_batch",
    "scan_filter", "group_agg", "hash_join", "window_rank", "sort_limit",
    "events_window_agg",
]
# dedup_groups is excluded: building its frame RUNS the fixpoint loop
# (driver-side actions); its plan is plain joins/aggregates with no Python
# boundary, covered by the dedup CHEAP_KEYS entries above.
INDEXED_KEYS = [
    "bm25_topk", "bm25_topk_docpart", "postings_decode", "threshold_search",
    "postings_build", "filter_topk_indexed", "phrase_count_indexed",
    "phrase_count3", "phrase_count3_indexed", "tfidf_topk_indexed",
    "proximity_count", "prefix_topk", "conv_topk",
]


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as e

    return e


@pytest.mark.parametrize("key", CHEAP_KEYS + INDEXED_KEYS)
def test_no_row_python_in_contract_plans(spark, entry_mod, key):
    # audit_queries = contract entries + audit-only brute twins (trimming
    # the driver contract to <=50 must never drop a path from this audit)
    df = entry_mod.audit_queries()[key](spark, SF_DIR)
    assert_no_row_python(df, key)
    # eager operators (dedup pair tiers) return their one persisted result
    # frame — release it so the audit walk leaves no pins behind for later
    # tests (callers own the pin by contract)
    df.unpersist()


def test_scan_filter_pushdown_and_pruning(spark, entry_mod):
    df = entry_mod.audit_queries()["scan_filter"](spark, SF_DIR)
    audit = plan_audit(df)
    pushed = " ".join(audit["pushed_filters"])
    assert "l_shipdate" in pushed and "l_discount" in pushed
    # projection pruned: the scan must not read all 16 lineitem columns
    assert audit["read_schemas"], "no parquet scan found"
    widest = max(s.count(",") + 1 for s in audit["read_schemas"])
    assert widest <= 6, f"scan reads too many columns: {audit['read_schemas']}"


def test_hash_join_broadcasts_small_side(spark, entry_mod):
    df = entry_mod.audit_queries()["hash_join"](spark, SF_DIR)
    assert plan_audit(df)["has_broadcast"], "customer side should broadcast"


def test_indexed_query_prunes_postings_partitions(spark, entry_mod):
    """The WAND path must read only the hive part_id buckets that hold the
    query's terms (directory pruning — the analog of jvector seeking only
    the adjacency regions a search touches)."""
    idx = entry_mod._index_for(spark, SF_DIR)
    from jvector_spark.index.query import bm25_topk_indexed

    df = bm25_topk_indexed(spark, idx, entry_mod._qterms(spark), k=10, prune=True)
    from jvector_spark.plans import explain_str

    plan = explain_str(df, "formatted")
    assert "part_id" in plan  # partition filter present on the postings scan


def test_minhash_verification_is_candidates_only(spark, entry_mod):
    """The exact-Jaccard verify stage of minhash_near_dups must be
    restricted to LSH candidates BEFORE the intersection aggregate: the
    plan carries the two left-semi restrictions (docs → candidate docs,
    pairs → candidate pairs), so no unrestricted shingle self-join exists
    (the round-1 scale anti-pattern)."""
    from jvector_spark.plans import explain_str

    df = entry_mod.queries()["minhash_near_dups"](spark, SF_DIR)
    plan = explain_str(df, "simple")
    df.unpersist()  # eager operator: release this test's pin
    assert plan.count("LeftSemi") >= 2, plan


def test_no_pinned_rdds_after_query_batch(spark, entry_mod):
    """Long-running serving hygiene: a query batch (and an index build)
    must leave zero persisted RDDs behind (round-1 leak: the prepared query
    relation and assign_dense_ids' range-pinned frame stayed cached)."""
    import tempfile

    from jvector_spark.index.build import build_index
    from jvector_spark.index.query import bm25_topk_indexed

    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    d = tempfile.mkdtemp(prefix="jv_hygiene_")
    docs = entry_mod._docs(spark, SF_DIR)
    build_index(docs, d, n_parts=2, checkpointed=False)
    bm25_topk_indexed(spark, d, entry_mod._qterms(spark), k=10, prune=True).count()
    bm25_topk_indexed(spark, d, entry_mod._qterms(spark), k=10, prune=False).count()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == baseline, (
        f"{after - baseline} new RDD(s) pinned after build+query batch"
    )


@pytest.mark.parametrize(
    "brute,indexed",
    [
        ("boolean_and", "boolean_and_indexed"),
        ("boolean_or", "boolean_or_indexed"),
        ("tfidf_topk", "tfidf_topk_indexed"),
        ("filter_topk", "filter_topk_indexed"),
        ("phrase_count3", "phrase_count3_indexed"),
    ],
)
def test_audit_only_brute_twins_equal_indexed_contract_entries(
    spark, entry_mod, brute, indexed
):
    """The five brute-force twins trimmed from the ≤50 driver contract must
    stay row-identical to their indexed siblings (whose oracle rows remain
    driver-checked) — so the trim loses zero correctness coverage."""
    aq = entry_mod.audit_queries()
    # the fixed 3-term phrase has zero occurrences at sf0.001 (equal-but-
    # empty is vacuous) — that pair compares at sf0.01, where it has rows
    sf = "/root/testdata/sf0.01" if brute == "phrase_count3" else SF_DIR
    b = aq[brute](spark, sf)
    i = aq[indexed](spark, sf)
    cols = sorted(b.columns)
    assert cols == sorted(i.columns)
    bs = sorted(map(tuple, b.select(*cols).collect()))
    is_ = sorted(map(tuple, i.select(*cols).collect()))
    assert bs == is_ and len(bs) > 0


def test_no_pinned_rdds_after_dedup_operators(spark, entry_mod):
    """The pair-generating dedup operators materialize eagerly and release
    their intermediate pins; the returned (persisted) frame is the ONE
    remaining pin and `.unpersist()` on it restores the baseline — so a
    long-lived session looping dedup accumulates nothing (round-2 ADVICE)."""
    from jvector_spark.operators.dedup import (
        dedup_components,
        jaccard_pairs,
        minhash_near_dups,
    )

    def pinned_ids() -> set:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    # compare ID SETS, not sizes: earlier tests' pins may be reclaimed by
    # the ContextCleaner mid-test, which would skew a size delta
    baseline = pinned_ids()
    docs = entry_mod._docs(spark, SF_DIR)
    pairs = minhash_near_dups(docs, threshold=0.5)
    comps = dedup_components(pairs)
    jac = jaccard_pairs(docs, threshold=0.5)
    new = pinned_ids() - baseline
    # ≤ 3: Spark's CacheManager dedupes identical plans, so an earlier
    # test's still-cached wrapper result can ABSORB one of our result pins
    # (never add); > 3 would mean an intermediate pin leaked (the ADVICE
    # regression this test guards)
    assert len(new) <= 3, f"intermediate pin leaked: {len(new)} new pins"
    comps.count()  # results stay usable from cache before release
    for df in (pairs, comps, jac):
        df.unpersist()
    left = pinned_ids() & new
    # every pin this test created must release via the RETURNED frame —
    # a leftover means an operator returned a frame derived from (not
    # identical to) its persisted result
    assert not left, f"{len(left)} RDD(s) still pinned after dedup release"


def test_wand_scan_skips_packed_columns_for_meta(spark, entry_mod):
    """block_meta reads must not drag the packed binary columns off disk —
    the fused-feature layout only pays for what pruning touches."""
    from jvector_spark.index.storage import block_meta

    idx = entry_mod._index_for(spark, SF_DIR)
    audit = plan_audit(block_meta(spark, idx))
    assert audit["read_schemas"]
    assert all("packed" not in s for s in audit["read_schemas"]), audit["read_schemas"]
