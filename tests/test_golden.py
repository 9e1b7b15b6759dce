"""Golden-format backward compatibility: the committed v2 index must keep
loading and answering byte-identically in every future engine build —
the analog of the reference's version0 golden files
(jvector-tests/resources/version0.pq, TestProductQuantization.java:216-231).

Regenerate ONLY on a deliberate format-version bump: python tools/make_golden.py
"""

from __future__ import annotations

import json
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def golden_case():
    path = os.path.join(GOLDEN, "v2_expected_topk.json")
    if not os.path.exists(path):
        pytest.skip("golden fixtures not generated")
    with open(path) as f:
        return json.load(f)


def test_golden_index_loads_and_answers(spark, golden_case):
    from jvector_spark.index.query import bm25_topk_indexed
    from jvector_spark.index.storage import read_segments
    from jvector_spark.operators.topk import queries_df

    idx = os.path.join(GOLDEN, "v2_index")
    seg = read_segments(spark, idx)
    assert seg["format_version"] == 2
    qdf = queries_df(spark, [(q, terms) for q, terms in golden_case["queries"]])
    got = [
        {
            "query_id": r.query_id,
            "rank": r.rank,
            "doc_id": r.doc_id,
            "score_u6": int(r.score * 1e6 + 0.5),
        }
        for r in bm25_topk_indexed(spark, idx, qdf, k=5, prune=True)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == golden_case["expected"]


def test_golden_positions_feature_still_decodes(spark, golden_case):
    from jvector_spark.index.positions import decode_positions, has_positions

    idx = os.path.join(GOLDEN, "v2_index")
    assert has_positions(idx)
    n = decode_positions(spark, idx).count()
    assert n > 0


@pytest.fixture(scope="module")
def vec_golden_case():
    path = os.path.join(GOLDEN, "vec_expected_topk.json")
    if not os.path.exists(path):
        pytest.skip("vector golden fixtures not generated")
    with open(path) as f:
        return json.load(f)


@pytest.mark.parametrize("tier", ["pq", "sq8", "bq", "nvq"])
def test_golden_vector_tier_loads_and_answers(spark, vec_golden_case, tier):
    """Committed PQ/SQ8/BQ structures must keep loading and answering
    rank-identically (the version0.pq idiom for the vector-tier formats,
    TestProductQuantization.java:216-231): a format-breaking change to
    index/vectors.py fails HERE without regenerating the artifacts."""
    from jvector_spark.fixtures import make_embeddings, make_embeddings_pdf
    from jvector_spark.index.vectors import (
        ann_topk_bq_indexed,
        ann_topk_nvq_indexed,
        ann_topk_pq_indexed,
        ann_topk_sq8_indexed,
        read_manifest,
    )

    runners = {
        "pq": ann_topk_pq_indexed,
        "sq8": ann_topk_sq8_indexed,
        "bq": ann_topk_bq_indexed,
        "nvq": ann_topk_nvq_indexed,
    }
    idx = os.path.join(GOLDEN, f"{tier}_index")
    man = read_manifest(spark, idx)
    assert man["kind"] == tier and man["dim"] == 32

    emb = make_embeddings(spark).cache()
    pdf = make_embeddings_pdf()
    k = vec_golden_case["k"]
    for qi, vid in enumerate(vec_golden_case["query_vec_ids"]):
        qv = list(pdf.loc[pdf["vec_id"] == vid, "embedding"].iloc[0])
        got = [
            {"rank": r.rank, "vec_id": r.vec_id, "cos_u9": int(r.cos * 1e9 + 0.5)}
            for r in runners[tier](spark, idx, emb, qv, k=k).collect()
        ]
        assert got == vec_golden_case["tiers"][tier][qi]


def test_golden_doc_map_text_invariant(spark, golden_case):
    """Per-turn natural-key invariant holds for the committed index."""
    from pyspark.sql import functions as F

    from jvector_spark.index.storage import read_table

    idx = os.path.join(GOLDEN, "v2_index")
    dm = read_table(spark, idx, "doc_map")
    assert dm.count() == dm.select("doc_id").distinct().count()
    assert dm.count() == dm.select("conv_id", "turn_idx").distinct().count()
    assert dm.filter(F.col("doc_id") < 0).count() == 0
