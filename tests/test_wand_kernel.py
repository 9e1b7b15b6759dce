"""Property tests for the Block-Max WAND kernel — no Spark involved, pure
numpy: random corpora → encoded blocks → kernel top-k must equal a naive
exhaustive scorer exactly, across k, salting, tombstones, accept masks,
sparse/dense tier splits, and pagination.

Analog of the reference's randomized recall tests with fixed seeds
(LuceneTestCase idiom, TestVectorGraph.java:626-673) — except ours asserts
EXACT equality, because our pruning is lossless."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from jvector_spark.index.build import encode_partition_pdf
from jvector_spark.index.query import wand_topk_arrays

K1, B = 1.2, 0.75


def _random_corpus(rng, n_docs, n_terms, density):
    """Random tf relation (term_id, doc_id, tf, dl) with Zipf-ish terms."""
    n_post = int(n_docs * n_terms * density)
    term = rng.zipf(1.3, size=n_post) % n_terms
    doc = rng.integers(0, n_docs, size=n_post)
    df = pd.DataFrame({"term_id": term.astype(np.int64), "doc_id": doc.astype(np.int64)})
    df = df.groupby(["term_id", "doc_id"]).size().rename("tf").reset_index()
    dl = pd.Series(
        rng.integers(1, 60, size=n_docs).astype(np.int64), name="dl"
    )
    df["dl"] = df["doc_id"].map(dl)
    df["tf"] = df["tf"].astype(np.int64)
    return df, n_docs


def _blocks_for_query(tf, qterms, weights, n_docs, block_size=16, n_salts=1):
    """Encode per-term blocks (optionally doc-range salted) and attach
    query weight/idf columns — the frame shape the kernel receives."""
    sub = tf[tf["term_id"].isin(qterms)].copy()
    sub["salt"] = np.minimum(
        (sub["doc_id"] * n_salts // max(n_docs, 1)).astype(np.int32), n_salts - 1
    )
    blocks = encode_partition_pdf(sub, block_size=block_size)
    dfreq = tf[tf["term_id"].isin(qterms)].groupby("term_id")["doc_id"].nunique()
    idf = {
        t: float(np.log(1.0 + (n_docs - dfreq.get(t, 0) + 0.5) / (dfreq.get(t, 0) + 0.5)))
        for t in qterms
    }
    blocks["weight"] = blocks["term_id"].map(dict(zip(qterms, weights))).astype(float)
    blocks["idf"] = blocks["term_id"].map(idf)
    return blocks


def _naive_topk(tf, qterms, weights, n_docs, avgdl, k, dead=None, accept=None):
    sub = tf[tf["term_id"].isin(qterms)].copy()
    if dead is not None:
        sub = sub[~sub["doc_id"].isin(dead)]
    if accept is not None:
        sub = sub[sub["doc_id"].isin(accept)]
    dfreq = tf[tf["term_id"].isin(qterms)].groupby("term_id")["doc_id"].nunique()
    w = dict(zip(qterms, weights))
    out: dict[int, float] = {}
    for r in sub.itertuples(index=False):
        idf = np.log(1.0 + (n_docs - dfreq[r.term_id] + 0.5) / (dfreq[r.term_id] + 0.5))
        c = w[r.term_id] * idf * r.tf / (r.tf + K1 * (1 - B + B * r.dl / avgdl))
        out[r.doc_id] = out.get(r.doc_id, 0.0) + c
    ranked = sorted(out.items(), key=lambda t: (-t[1], t[0]))[:k]
    return [(d, round(s, 9)) for d, s in ranked]


@pytest.mark.parametrize("seed", range(12))
def test_kernel_equals_naive_random(seed):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(50, 800))
    n_terms = int(rng.integers(5, 40))
    tf, n_docs = _random_corpus(rng, n_docs, n_terms, density=0.2)
    if len(tf) == 0:
        return
    avgdl = float(tf.drop_duplicates("doc_id")["dl"].mean())
    nq = int(rng.integers(1, min(5, n_terms) + 1))
    qterms = list(rng.choice(tf["term_id"].unique(), size=nq, replace=False))
    weights = [float(x) for x in rng.uniform(0.5, 2.0, size=nq)]
    k = int(rng.integers(1, 15))
    n_salts = int(rng.integers(1, 4))
    sparse_limit = int(rng.choice([0, 8, 2048, 2**62]))

    blocks = _blocks_for_query(
        tf, qterms, weights, n_docs,
        block_size=int(rng.integers(4, 33)), n_salts=n_salts,
    )
    docs, scores, dec, skip = wand_topk_arrays(
        blocks, k, K1, B, avgdl, sparse_limit=sparse_limit
    )
    got = [(int(d), round(float(s), 9)) for d, s in zip(docs, scores)]
    want = _naive_topk(tf, qterms, weights, n_docs, avgdl, k)
    assert got == want, (seed, sparse_limit, n_salts)
    assert dec + skip == len(blocks)


@pytest.mark.parametrize("seed", range(6))
def test_kernel_masks_random(seed):
    rng = np.random.default_rng(1000 + seed)
    tf, n_docs = _random_corpus(rng, 300, 20, density=0.25)
    avgdl = float(tf.drop_duplicates("doc_id")["dl"].mean())
    qterms = list(rng.choice(tf["term_id"].unique(), size=3, replace=False))
    weights = [1.0, 1.0, 2.0]
    all_docs = np.arange(n_docs)
    dead = np.sort(rng.choice(all_docs, size=30, replace=False))
    accept = np.sort(rng.choice(all_docs, size=150, replace=False))
    blocks = _blocks_for_query(tf, qterms, weights, n_docs, n_salts=2)

    docs, scores, _d, _s = wand_topk_arrays(
        blocks, 10, K1, B, avgdl, dead=dead, accept=accept
    )
    got = [(int(d), round(float(s), 9)) for d, s in zip(docs, scores)]
    want = _naive_topk(
        tf, qterms, weights, n_docs, avgdl, 10, dead=set(dead), accept=set(accept)
    )
    assert got == want
    assert not set(docs) & set(dead)
    assert set(docs) <= set(accept)


def test_kernel_empty_and_degenerate():
    empty = pd.DataFrame(
        {
            c: pd.Series(dtype=t)
            for c, t in [
                ("term_id", "int64"), ("salt", "int32"), ("block_id", "int32"),
                ("n", "int32"), ("base", "int64"), ("max_doc_id", "int64"),
                ("max_tf", "int64"), ("min_dl", "int64"),
                ("doc_ids_packed", object), ("tfs_packed", object),
                ("dls_packed", object), ("weight", "float64"), ("idf", "float64"),
            ]
        }
    )
    docs, scores, dec, skip = wand_topk_arrays(empty, 10, K1, B, 20.0)
    assert len(docs) == 0 and dec == 0 and skip == 0

    # single doc, single term
    tf = pd.DataFrame(
        {"term_id": [0], "doc_id": [7], "tf": [3], "dl": [9], "salt": [0]}
    )
    blocks = encode_partition_pdf(tf[["term_id", "salt", "doc_id", "tf", "dl"]])
    blocks["weight"] = 1.0
    blocks["idf"] = 1.5
    docs, scores, _d, _s = wand_topk_arrays(blocks, 5, K1, B, 9.0)
    assert list(docs) == [7]
    expected = 1.5 * 3 / (3 + K1 * (1 - B + B * 1.0))
    assert abs(scores[0] - expected) < 1e-12
