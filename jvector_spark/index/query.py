"""Index-backed BM25 query engine: posting-block decode, exact relational
scoring, and Block-Max-WAND pruned top-k.

Reference analog: GraphSearcher's two-phase search with early termination
(jvector-base/.../graph/GraphSearcher.java:209-487, ScoreTracker.java:158-263,
surveyed Q1-Q6/P4-P5). Key difference exploited here: BM25 block upper
bounds are *exact* maxima computed at build time, so pruning is lossless —
the pruned and unpruned paths must return byte-identical results (tested),
unlike the reference's approximate first pass.

Plan shape / scale notes:
- the query set joins the dictionary broadcast-side; the needed ``part_id``
  hive-buckets are computed first so the postings scan *directory-prunes*
  to only the buckets holding the query's terms — the analog of jvector
  seeking only the adjacency regions a search touches;
- the fused blocks carry tf **and dl** inline, so exact scoring never
  touches the corpus-sized doc_stats table at query time;
- pruned path: one task per query (a searcher per query, exactly the
  reference's GraphSearcher-per-thread model) — cluster QPS scales across
  queries; candidate segments are processed in descending upper-bound order
  with a rising top-k floor θ, skipping every block whose doc-range segment
  cannot beat θ;
- unpruned path: decode → relational aggregate → window top-k; it is the
  oracle for the pruned path and the scale-out path for very large single
  queries (per-doc-range partial top-k then global merge, the rerankFloor
  analog of Q10).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from .codec import varint_decode
from .storage import read_segments, read_table, table_path, tombstone_ids


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _decode_rows(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode a frame of posting blocks → flat (row_idx, doc_id, tf, dl)."""
    ids_out, tfs_out, dls_out, idx_out = [], [], [], []
    base = pdf["base"].to_numpy(np.int64)
    ns = pdf["n"].to_numpy(np.int64)
    for i in range(len(pdf)):
        n = int(ns[i])
        gaps = varint_decode(pdf["doc_ids_packed"].iat[i], n).astype(np.int64)
        gaps[0] += base[i]
        ids_out.append(np.cumsum(gaps))
        tfs_out.append(varint_decode(pdf["tfs_packed"].iat[i], n).astype(np.int64))
        dls_out.append(varint_decode(pdf["dls_packed"].iat[i], n).astype(np.int64))
        idx_out.append(np.full(n, i, dtype=np.int64))
    if not ids_out:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z
    return (
        np.concatenate(idx_out),
        np.concatenate(ids_out),
        np.concatenate(tfs_out),
        np.concatenate(dls_out),
    )


def _decode_map_fn(carry_cols: list[str]):
    out_cols = carry_cols + ["doc_id", "tf", "dl"]

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            idx, doc, tf, dl = _decode_rows(pdf)
            out = pdf.iloc[idx][carry_cols].reset_index(drop=True)
            out["doc_id"] = doc
            out["tf"] = tf
            out["dl"] = dl
            yield out[out_cols]

    return fn


def decode_postings(spark: SparkSession, index_dir: str, extra_cols: list[str] | None = None) -> DataFrame:
    """(term_id, doc_id, tf, dl [, extra]) — full decode of the postings
    table; must equal the enriched term_freq relation exactly (round-trip
    test, the analog of TestOnDiskGraphIndex write→load→search parity)."""
    carry = ["term_id"] + (extra_cols or [])
    postings = read_table(spark, index_dir, "postings")
    schema = ", ".join(
        {"term_id": "term_id long"}.get(c, f"{c} {'int' if c in ('salt','block_id','n') else 'long'}")
        for c in carry
    ) + ", doc_id long, tf long, dl long"
    return postings.mapInPandas(_decode_map_fn(carry), schema=schema)


# ---------------------------------------------------------------------------
# query prep
# ---------------------------------------------------------------------------

def _prepared_query_blocks(
    spark: SparkSession, index_dir: str, qterms: DataFrame, seg: dict
) -> DataFrame:
    """Join the query set to the dictionary and fetch only the posting
    blocks of queried terms, with directory-level part_id pruning."""
    dct = read_table(spark, index_dir, "dictionary")
    qd = (
        qterms.join(dct.select("term", "term_id", "df", "n_salts"), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(seg["n_docs"])) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .select("query_id", "term_id", "weight", "idf", "n_salts")
    )
    qd = qd.persist()
    # which hive buckets hold these terms? tiny frame → collect is O(q·salts)
    parts = [
        r.part_id
        for r in qd.select(
            F.explode(F.sequence(F.lit(0), F.col("n_salts") - 1)).alias("salt"),
            "term_id",
        )
        .select(
            F.pmod(F.xxhash64("term_id", "salt"), F.lit(int(seg["n_parts"])))
            .cast("int")
            .alias("part_id")
        )
        .distinct()
        .collect()
    ]
    postings = read_table(spark, index_dir, "postings")
    if parts:
        postings = postings.filter(F.col("part_id").isin(parts))
    return postings.join(F.broadcast(qd.drop("n_salts")), "term_id")


def _mask_tombstones(spark: SparkSession, index_dir: str, decoded: DataFrame) -> DataFrame:
    """Anti-join decoded postings against the tombstone set (broadcast) —
    deleted docs must neither fill nor shadow result slots (M1 semantics,
    the Bits-acceptOrds filter of GraphSearcher.java:202-205)."""
    dead = tombstone_ids(spark, index_dir)
    if not dead:
        return decoded
    dead_df = F.broadcast(
        spark.createDataFrame([(int(x),) for x in sorted(dead)], "doc_id long")
    )
    return decoded.join(dead_df, "doc_id", "left_anti")


# ---------------------------------------------------------------------------
# unpruned (relational, exact) path
# ---------------------------------------------------------------------------

def bm25_topk_indexed_unpruned(
    spark: SparkSession, index_dir: str, qterms: DataFrame, k: int = 10,
    offset: int = 0,
) -> DataFrame:
    """Decode matched blocks → JVM-side scoring → window top-k."""
    seg = read_segments(spark, index_dir)
    blocks = _prepared_query_blocks(spark, index_dir, qterms, seg)
    carry = ["term_id", "query_id", "weight", "idf"]
    schema = "term_id long, query_id int, weight double, idf double, doc_id long, tf long, dl long"
    decoded = blocks.select(*carry, "n", "base", "doc_ids_packed", "tfs_packed", "dls_packed").mapInPandas(
        _decode_map_fn(carry), schema=schema
    )
    decoded = _mask_tombstones(spark, index_dir, decoded)
    k1, b, avgdl = seg["k1"], seg["b"], seg["avgdl"]
    contrib = (
        F.col("weight")
        * F.col("idf")
        * F.col("tf")
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
    )
    scored = (
        decoded.withColumn("contrib", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") > offset) & (F.col("rank") <= offset + k))
        .select("query_id", "rank", "doc_id", "score")
    )


# ---------------------------------------------------------------------------
# pruned (Block-Max WAND) path
# ---------------------------------------------------------------------------

# terms with at most this many postings in a query's working set are
# decoded exactly upfront instead of bounded: a sparse term's single block
# spans nearly the whole doc space, so leaving it bounded adds its full
# upper bound to EVERY segment and strangles pruning. Decoding it costs
# microseconds; pruning then has to beat only the dense terms' bounds.
SPARSE_EXACT_LIMIT = 2048


def wand_topk_arrays(
    pdf: pd.DataFrame,
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    dead: np.ndarray | None = None,
    accept: np.ndarray | None = None,
    sparse_limit: int = SPARSE_EXACT_LIMIT,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Pure numpy Block-Max top-k for one query's posting blocks — the
    two-phase scorer (approx bound + exact, GraphSearcher.java:451-487)
    with a two-tier term split:

    - **Sparse terms** (≤ ``sparse_limit`` postings in this query's working
      set) are decoded EXACTLY upfront — microseconds of work. A sparse
      term's one block spans nearly the whole doc space; bounding it would
      add its full upper bound to every segment and strangle pruning (this
      is the rerank-tier analog: exact scores where exactness is cheap).
    - **Dense terms**' block doc-ranges [base, max_doc_id] induce a
      piecewise-constant upper-bound function over doc space; each
      segment's bound = dense UB sum + the max exact sparse contribution
      inside the segment. Bounds are DERIVED from stored (max_tf, min_dl)
      and current global stats — still valid (BM25 monotone in tf, anti-
      monotone in dl) after incremental extends change n_docs/avgdl.

    Sweep segments in descending bound order; decode only blocks
    overlapping segments that can still beat the current k-th score θ
    (skip iff UB < θ — ties must be processed so the smaller-doc_id winner
    is found, mirroring NodeQueue.java:104-129). Segments partition doc
    space and sparse-only docs outside dense coverage enter the heap with
    complete scores, so the result equals the unpruned path exactly.
    ``dead`` (sorted tombstoned doc_ids) are masked before scoring so
    deleted docs neither fill nor shadow result slots; ``accept`` (sorted
    doc_ids) restricts the result universe — the Bits-acceptOrds predicate
    filter of GraphSearcher.java:202-205 (Q8).
    Returns (doc_ids, scores, blocks_decoded, blocks_skipped).
    """
    nb = len(pdf)
    lo = pdf["base"].to_numpy(np.int64)
    hi = pdf["max_doc_id"].to_numpy(np.int64)
    idf = pdf["idf"].to_numpy(np.float64)
    weight = pdf["weight"].to_numpy(np.float64)
    ns = pdf["n"].to_numpy(np.int64)
    term = pdf["term_id"].to_numpy(np.int64)
    max_tf = pdf["max_tf"].to_numpy(np.float64)
    min_dl = pdf["min_dl"].to_numpy(np.float64)
    ub = (
        weight * idf * max_tf
        / (max_tf + k1 * (1.0 - b + b * min_dl / avgdl))
    )

    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def decode(bi: int) -> tuple[np.ndarray, np.ndarray]:
        got = decoded.get(bi)
        if got is not None:
            return got
        n = int(ns[bi])
        gaps = varint_decode(pdf["doc_ids_packed"].iat[bi], n).astype(np.int64)
        gaps[0] += lo[bi]
        docs = np.cumsum(gaps)
        tf = varint_decode(pdf["tfs_packed"].iat[bi], n).astype(np.float64)
        dl = varint_decode(pdf["dls_packed"].iat[bi], n).astype(np.float64)
        if dead is not None and len(dead):
            alive = ~np.isin(docs, dead, assume_unique=False)
            docs, tf, dl = docs[alive], tf[alive], dl[alive]
        if accept is not None:
            keep = np.isin(docs, accept, assume_unique=False)
            docs, tf, dl = docs[keep], tf[keep], dl[keep]
        contrib = (
            weight[bi] * idf[bi] * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
        )
        decoded[bi] = (docs, contrib)
        return decoded[bi]

    # --- split terms: sparse → exact upfront, dense → bounded ------------
    uniq_t, inv_t = np.unique(term, return_inverse=True)
    term_total = np.bincount(inv_t, weights=ns.astype(np.float64))
    sparse_blk = term_total[inv_t] <= sparse_limit

    s_parts_d, s_parts_c = [], []
    for bi in np.flatnonzero(sparse_blk):
        d_, c_ = decode(int(bi))
        if len(d_):
            s_parts_d.append(d_)
            s_parts_c.append(c_)
    if s_parts_d:
        sd_all = np.concatenate(s_parts_d)
        sc_all = np.concatenate(s_parts_c)
        usd, inv = np.unique(sd_all, return_inverse=True)
        usc = np.bincount(inv, weights=sc_all)
    else:
        usd = np.zeros(0, dtype=np.int64)
        usc = np.zeros(0, dtype=np.float64)

    d_idx = np.flatnonzero(~sparse_blk)
    if len(d_idx) == 0:
        sel = np.lexsort((usd, -usc))[:k]
        return usd[sel], usc[sel], len(decoded), 0

    # --- dense segments: piecewise-constant upper bound over doc space ---
    lo_d, hi_d, ub_d = lo[d_idx], hi[d_idx], ub[d_idx]
    bounds = np.unique(np.concatenate([lo_d, hi_d + 1]))
    seg_lo = bounds[:-1]
    seg_hi = bounds[1:]  # exclusive
    n_seg = len(seg_lo)
    delta = np.zeros(n_seg + 1, dtype=np.float64)
    li = np.searchsorted(seg_lo, lo_d)
    ri = np.searchsorted(seg_lo, hi_d + 1)
    np.add.at(delta, li, ub_d)
    np.add.at(delta, ri, -ub_d)
    seg_ub = np.cumsum(delta[:-1])

    # sparse side of each segment's bound: the max exact sparse
    # contribution of any doc in the segment's range (exact, not a bound)
    if len(usd):
        sl = np.searchsorted(usd, seg_lo)
        sr = np.searchsorted(usd, seg_hi)
        seg_smax = np.zeros(n_seg, dtype=np.float64)
        nz = np.flatnonzero(sl < sr)
        if len(nz):
            usc_ext = np.append(usc, -np.inf)  # sentinel: allows index len
            ind = np.empty(2 * len(nz), dtype=np.int64)
            ind[0::2] = sl[nz]
            ind[1::2] = sr[nz]
            seg_smax[nz] = np.maximum.reduceat(usc_ext, ind)[0::2]
        seg_ub = seg_ub + seg_smax

    order = np.argsort(-seg_ub, kind="mergesort")
    seg_blocks: list[list[int]] = [[] for _ in range(n_seg)]
    for j, bi in enumerate(d_idx):
        for s in range(li[j], ri[j]):
            seg_blocks[s].append(int(bi))

    # sparse-only docs outside dense coverage have complete scores already
    top_docs = np.zeros(0, dtype=np.int64)
    top_scores = np.zeros(0, dtype=np.float64)
    if len(usd):
        outside = (usd < seg_lo[0]) | (usd >= seg_hi[-1])
        if outside.any():
            od, oc = usd[outside], usc[outside]
            sel = np.lexsort((od, -oc))[:k]
            top_docs, top_scores = od[sel], oc[sel]
    theta = top_scores[k - 1] if len(top_scores) >= k else -math.inf

    for s in order:
        if len(top_docs) >= k and seg_ub[s] < theta:
            break  # segments sorted by UB desc — nothing later can qualify
        docs_parts, contrib_parts = [], []
        for bi in seg_blocks[s]:
            docs, contrib = decode(bi)
            m = (docs >= seg_lo[s]) & (docs < seg_hi[s])
            if m.any():
                docs_parts.append(docs[m])
                contrib_parts.append(contrib[m])
        if len(usd):
            l0, r0 = np.searchsorted(usd, seg_lo[s]), np.searchsorted(usd, seg_hi[s])
            if r0 > l0:
                docs_parts.append(usd[l0:r0])
                contrib_parts.append(usc[l0:r0])
        if not docs_parts:
            continue
        d = np.concatenate(docs_parts)
        c = np.concatenate(contrib_parts)
        ud, inv = np.unique(d, return_inverse=True)
        sc = np.bincount(inv, weights=c)
        # merge into running top-k (docs across segments are disjoint, and
        # outside-docs never fall inside a segment)
        top_docs = np.concatenate([top_docs, ud])
        top_scores = np.concatenate([top_scores, sc])
        sel = np.lexsort((top_docs, -top_scores))[:k]
        top_docs, top_scores = top_docs[sel], top_scores[sel]
        if len(top_docs) >= k:
            theta = top_scores[-1]

    return top_docs, top_scores, len(decoded), nb - len(decoded)


def _wand_group_fn(
    k: int, k1: float, b: float, avgdl: float, with_metrics: bool,
    dead: np.ndarray | None = None,
    accept: np.ndarray | None = None,
    offset: int = 0,
):
    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(key[0])
        # pagination (Q9 resume analog): compute top-(offset+k) exactly,
        # emit ranks (offset, offset+k] — a batch engine re-derives the
        # skipped prefix instead of holding cursor state
        docs, scores, dec, skip = wand_topk_arrays(
            pdf, offset + k, k1, b, avgdl, dead, accept
        )
        docs, scores = docs[offset:], scores[offset:]
        out = pd.DataFrame(
            {
                "query_id": np.full(len(docs), qid, dtype=np.int32),
                "rank": np.arange(offset + 1, offset + len(docs) + 1, dtype=np.int32),
                "doc_id": docs,
                "score": scores,
            }
        )
        if with_metrics:
            out["blocks_decoded"] = np.int32(dec)
            out["blocks_skipped"] = np.int32(skip)
        return out

    return fn


def bm25_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    qterms: DataFrame,
    k: int = 10,
    prune: bool = True,
    with_metrics: bool = False,
    offset: int = 0,
) -> DataFrame:
    """BM25 top-k over the index. ``prune=False`` is the relational exact
    path; ``prune=True`` runs Block-Max WAND (results must be identical —
    the ``usePruning`` escape hatch mirrors Bench.java:56). Tombstoned
    docs (index/maintenance.delete_docs) are masked on both paths.
    ``offset`` pages past the first ``offset`` results (Q9 resume analog,
    GraphSearcher.java:489-527)."""
    if not prune:
        return bm25_topk_indexed_unpruned(spark, index_dir, qterms, k, offset)
    seg = read_segments(spark, index_dir)
    dead_set = tombstone_ids(spark, index_dir)
    dead = (
        np.sort(np.fromiter(dead_set, dtype=np.int64)) if dead_set else None
    )
    blocks = _prepared_query_blocks(spark, index_dir, qterms, seg)
    schema = "query_id int, rank int, doc_id long, score double"
    if with_metrics:
        schema += ", blocks_decoded int, blocks_skipped int"
    return (
        blocks.select(
            "query_id", "term_id", "weight", "idf", "n", "base", "max_doc_id",
            "max_tf", "min_dl", "doc_ids_packed", "tfs_packed", "dls_packed",
        )
        .groupBy("query_id")
        .applyInPandas(
            _wand_group_fn(
                k, seg["k1"], seg["b"], seg["avgdl"], with_metrics, dead,
                offset=offset,
            ),
            schema=schema,
        )
    )


def threshold_search_indexed(
    spark: SparkSession, index_dir: str, qterms: DataFrame, theta: float
) -> DataFrame:
    """All (query_id, doc_id, score) with score ≥ θ (reference analog:
    threshold search, GraphSearcher.java:192-196 / Q7) — exact and cheap in
    batch: score-all then filter."""
    seg = read_segments(spark, index_dir)
    blocks = _prepared_query_blocks(spark, index_dir, qterms, seg)
    carry = ["term_id", "query_id", "weight", "idf"]
    schema = "term_id long, query_id int, weight double, idf double, doc_id long, tf long, dl long"
    decoded = blocks.select(*carry, "n", "base", "doc_ids_packed", "tfs_packed", "dls_packed").mapInPandas(
        _decode_map_fn(carry), schema=schema
    )
    decoded = _mask_tombstones(spark, index_dir, decoded)
    k1, b, avgdl = seg["k1"], seg["b"], seg["avgdl"]
    contrib = (
        F.col("weight") * F.col("idf") * F.col("tf")
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)))
    )
    return (
        decoded.withColumn("contrib", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
        .filter(F.col("score") >= theta)
    )


# ---------------------------------------------------------------------------
# predicate-filtered search (Bits acceptOrds analog, Q8)
# ---------------------------------------------------------------------------

# above this many accepted ids, stop shipping the mask into the WAND UDF and
# switch to the shuffle-join relational plan — same crossover reasoning as
# Spark's own broadcast-join threshold
ACCEPT_BROADCAST_LIMIT = 5_000_000


def bm25_topk_indexed_filtered(
    spark: SparkSession,
    index_dir: str,
    qterms: DataFrame,
    accept: DataFrame,
    k: int = 10,
    accept_limit: int = ACCEPT_BROADCAST_LIMIT,
) -> DataFrame:
    """Top-k restricted to the docs in ``accept`` (a DataFrame with a
    ``doc_id`` column — typically the output of any predicate over
    ``doc_map`` or the source table). Reference analog: the ``Bits
    acceptOrds`` result-universe filter (GraphSearcher.java:202-205,
    TestLowCardinalityFiltering.java:53-57).

    Physical strategy, chosen like the reference chooses filter strategy by
    selectivity: a *selective* predicate yields a small accept set → ship it
    into the Block-Max WAND kernel as a sorted id mask (pruning stays
    lossless: unfiltered block bounds still upper-bound filtered scores). A
    *broad* predicate (> ``accept_limit`` ids) → relational plan: decode
    matched blocks, hash-join the accept set on doc_id (Catalyst/AQE pick
    broadcast vs shuffle), score JVM-side, window top-k. Both paths return
    identical results (tested)."""
    n_accept = accept.count()
    if n_accept <= accept_limit:
        ids = np.sort(
            np.fromiter(
                (r[0] for r in accept.select("doc_id").distinct().collect()),
                dtype=np.int64,
            )
        )
        seg = read_segments(spark, index_dir)
        dead_set = tombstone_ids(spark, index_dir)
        dead = (
            np.sort(np.fromiter(dead_set, dtype=np.int64)) if dead_set else None
        )
        blocks = _prepared_query_blocks(spark, index_dir, qterms, seg)
        return (
            blocks.select(
                "query_id", "term_id", "weight", "idf", "n", "base", "max_doc_id",
                "max_tf", "min_dl", "doc_ids_packed", "tfs_packed", "dls_packed",
            )
            .groupBy("query_id")
            .applyInPandas(
                _wand_group_fn(
                    k, seg["k1"], seg["b"], seg["avgdl"], False, dead, ids
                ),
                schema="query_id int, rank int, doc_id long, score double",
            )
        )

    # relational path: scales to arbitrarily large accept sets
    seg = read_segments(spark, index_dir)
    blocks = _prepared_query_blocks(spark, index_dir, qterms, seg)
    carry = ["term_id", "query_id", "weight", "idf"]
    schema = (
        "term_id long, query_id int, weight double, idf double, "
        "doc_id long, tf long, dl long"
    )
    decoded = blocks.select(
        *carry, "n", "base", "doc_ids_packed", "tfs_packed", "dls_packed"
    ).mapInPandas(_decode_map_fn(carry), schema=schema)
    decoded = _mask_tombstones(spark, index_dir, decoded)
    decoded = decoded.join(accept.select("doc_id").distinct(), "doc_id")
    k1, b, avgdl = seg["k1"], seg["b"], seg["avgdl"]
    contrib = (
        F.col("weight") * F.col("idf") * F.col("tf")
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
    )
    scored = (
        decoded.withColumn("contrib", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
