"""Optional positional-postings feature: per-occurrence token positions
packed beside the inverted index, enabling index-level phrase queries.

Reference analog: the on-disk format's *feature-flagged per-node payloads*
— a graph index optionally inlines INLINE_VECTORS / FUSED_PQ / NVQ_VECTORS
records per node, discovered via a header bitset
(jvector-base/.../graph/disk/feature/FeatureId.java:31-62,
AbstractGraphIndexWriter.java:46-53). Here the optional feature is a
``positions/`` table (same hive ``part_id`` bucketing as ``postings/``);
its presence on disk *is* the feature flag. Indexes built without it answer
every non-positional query unchanged.

Wire format per positions block (BLOCK_SIZE docs per block, same doc-gap
delta+varint scheme as the core codec):

    doc_ids_packed:   varint(doc gaps)           one per doc in block
    counts_packed:    varint(occurrences per doc)
    positions_packed: varint(position deltas)    one per occurrence;
                      a doc's first position is stored raw, subsequent
                      positions as gaps (positions are 1-based, strictly
                      increasing within a doc)

Phrase matching decodes only the queried terms' blocks (directory-pruned)
into a flat (term_id, doc_id, pos) relation and self-joins on
(doc_id, pos+1) JVM-side — the relational twin of Lucene's positional
intersection, and exactly the shape of the brute-force oracle, so results
must match it row-for-row (tested).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import BLOCK_SIZE
from ..operators.phrase import token_positions
from .build import _varint_encode_with_lengths
from .codec import varint_decode
from .storage import (
    read_segments,
    read_table,
    shuffle_n,
    sized_shuffle_n,
    table_path,
)

POSITIONS_SCHEMA = (
    "term_id long, salt int, block_id int, n int, base long, max_doc_id long, "
    "n_occ int, doc_ids_packed binary, counts_packed binary, positions_packed binary"
)


def _empty_positions_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "term_id": pd.Series(dtype="int64"),
            "salt": pd.Series(dtype="int32"),
            "block_id": pd.Series(dtype="int32"),
            "n": pd.Series(dtype="int32"),
            "base": pd.Series(dtype="int64"),
            "max_doc_id": pd.Series(dtype="int64"),
            "n_occ": pd.Series(dtype="int32"),
            "doc_ids_packed": pd.Series(dtype=object),
            "counts_packed": pd.Series(dtype=object),
            "positions_packed": pd.Series(dtype=object),
        }
    )


def encode_positions_pdf(pdf: pd.DataFrame, block_size: int = BLOCK_SIZE) -> pd.DataFrame:
    """Vectorized block encoder over one partition of the occurrence
    relation (term_id, salt, doc_id, pos); rows may arrive unsorted."""
    if len(pdf) == 0:
        return _empty_positions_pdf()
    pdf = pdf.sort_values(["term_id", "salt", "doc_id", "pos"], kind="mergesort")
    term = pdf["term_id"].to_numpy(np.int64)
    salt = pdf["salt"].to_numpy(np.int32)
    d = pdf["doc_id"].to_numpy(np.int64)
    pos = pdf["pos"].to_numpy(np.int64)
    n_occ_total = len(d)

    # occurrence-level boundaries
    grp_start = np.ones(n_occ_total, dtype=bool)  # (term, salt) run starts
    grp_start[1:] = (term[1:] != term[:-1]) | (salt[1:] != salt[:-1])
    doc_start = grp_start.copy()
    doc_start[1:] |= d[1:] != d[:-1]

    # position deltas: raw at each doc start, gap otherwise
    pdelta = pos.copy()
    pdelta[1:] = np.where(doc_start[1:], pos[1:], pos[1:] - pos[:-1])
    pos_buf, pos_len = _varint_encode_with_lengths(pdelta.astype(np.uint64))
    pos_off = np.concatenate(([0], np.cumsum(pos_len)))

    # doc-level arrays
    dstarts = np.flatnonzero(doc_start)  # occ index of each doc's first occ
    dends = np.empty_like(dstarts)
    dends[:-1] = dstarts[1:]
    dends[-1] = n_occ_total
    dd = d[dstarts]
    dterm = term[dstarts]
    dsalt = salt[dstarts]
    counts = (dends - dstarts).astype(np.int64)
    n_docs = len(dd)

    dgrp_start = np.ones(n_docs, dtype=bool)
    dgrp_start[1:] = (dterm[1:] != dterm[:-1]) | (dsalt[1:] != dsalt[:-1])
    gidx = np.cumsum(dgrp_start) - 1
    first_of_group = np.flatnonzero(dgrp_start)
    dpos_in_grp = np.arange(n_docs) - first_of_group[gidx]
    blk_start = dgrp_start | (dpos_in_grp % block_size == 0)

    prev_d = np.empty(n_docs, dtype=np.int64)
    prev_d[1:] = dd[:-1]
    prev_d[dgrp_start] = dd[dgrp_start]  # first gap 0; base = first doc itself
    gaps = (dd - prev_d).astype(np.uint64)
    id_buf, id_len = _varint_encode_with_lengths(gaps)
    id_off = np.concatenate(([0], np.cumsum(id_len)))
    cnt_buf, cnt_len = _varint_encode_with_lengths(counts.astype(np.uint64))
    cnt_off = np.concatenate(([0], np.cumsum(cnt_len)))

    bstarts = np.flatnonzero(blk_start)  # doc index of each block start
    bends = np.empty_like(bstarts)
    bends[:-1] = bstarts[1:]
    bends[-1] = n_docs
    base = np.where(
        bstarts == first_of_group[gidx[bstarts]], dd[bstarts], dd[bstarts - 1]
    )
    # occurrence byte-ranges per block
    occ_s = dstarts[bstarts]
    occ_e = np.where(bends < n_docs, dstarts[np.minimum(bends, n_docs - 1)], n_occ_total)
    occ_e[bends >= n_docs] = n_occ_total

    return pd.DataFrame(
        {
            "term_id": dterm[bstarts],
            "salt": dsalt[bstarts].astype("int32"),
            "block_id": (dpos_in_grp[bstarts] // block_size).astype("int32"),
            "n": (bends - bstarts).astype("int32"),
            "base": base,
            "max_doc_id": dd[bends - 1],
            "n_occ": (occ_e - occ_s).astype("int32"),
            "doc_ids_packed": [
                id_buf[id_off[s] : id_off[e]] for s, e in zip(bstarts, bends)
            ],
            "counts_packed": [
                cnt_buf[cnt_off[s] : cnt_off[e]] for s, e in zip(bstarts, bends)
            ],
            "positions_packed": [
                pos_buf[pos_off[s] : pos_off[e]] for s, e in zip(occ_s, occ_e)
            ],
        }
    )


def _encode_positions_map_fn(block_size: int):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        batches = [p for p in it]
        if not batches:
            yield _empty_positions_pdf()
            return
        yield encode_positions_pdf(
            pd.concat(batches, ignore_index=True), block_size
        )

    return fn


def add_positions(
    corpus: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Attach the positional feature to an existing index (built from the
    same corpus): one extra shuffle-by-(term_id, salt) over the occurrence
    relation, written into the same part_id buckets as ``postings/``."""
    spark = corpus.sparkSession
    seg = read_segments(spark, index_dir)
    n_docs, n_parts = int(seg["n_docs"]), int(seg["n_parts"])
    block_size = int(seg["block_size"])

    occ = token_positions(corpus, text_col, id_col).withColumnRenamed(id_col, "doc_id")
    dct = read_table(spark, index_dir, "dictionary")
    enriched = (
        occ.join(dct.select("term", "term_id", "n_salts"), "term")
        .withColumn(
            "salt",
            F.least(
                (F.col("doc_id") * F.col("n_salts") / F.lit(n_docs)).cast("int"),
                F.col("n_salts") - 1,
            ).cast("int"),
        )
        .withColumn(
            "part_id",
            F.pmod(F.xxhash64("term_id", "salt"), F.lit(n_parts)).cast("int"),
        )
        .select("part_id", "term_id", "salt", "doc_id", "pos")
    )
    from pyspark.sql import Observation

    # block/occurrence totals observed on the write itself (no read-back
    # count + aggregate jobs over the table just written)
    obs = Observation("positions_build_totals")
    blocks = (
        enriched.repartition(
            sized_shuffle_n(enriched, float(seg["n_docs"]) * float(seg["avgdl"])),
            "part_id", "term_id", "salt",
        )
        .mapInPandas(
            lambda it: _carry_part(it, block_size),
            schema="part_id int, " + POSITIONS_SCHEMA,
        )
        .observe(
            obs,
            F.count("*").alias("blocks"),
            F.coalesce(F.sum("n_occ"), F.lit(0)).alias("occ"),
        )
    )
    blocks.write.mode("overwrite").partitionBy("part_id").parquet(
        table_path(index_dir, "positions")
    )
    m = obs.get
    return {"blocks": int(m["blocks"]), "occurrences": int(m["occ"])}


def _carry_part(it: Iterator[pd.DataFrame], block_size: int) -> Iterator[pd.DataFrame]:
    batches = [p for p in it]
    if not batches:
        e = _empty_positions_pdf()
        e.insert(0, "part_id", pd.Series(dtype="int32"))
        yield e
        return
    pdf = pd.concat(batches, ignore_index=True)
    part_by_key = pdf.drop_duplicates(["term_id", "salt"]).set_index(
        ["term_id", "salt"]
    )["part_id"]
    out = encode_positions_pdf(pdf.drop(columns=["part_id"]), block_size)
    out.insert(
        0,
        "part_id",
        part_by_key.reindex(
            pd.MultiIndex.from_arrays([out["term_id"], out["salt"]])
        ).to_numpy(np.int32),
    )
    yield out


def has_positions(index_dir: str) -> bool:
    """Feature-flag check (the FeatureId-bitset analog)."""
    import os

    return os.path.exists(table_path(index_dir, "positions"))


# ---------------------------------------------------------------------------
# decode + phrase query
# ---------------------------------------------------------------------------

def _decode_positions_map_fn():
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            # bulk decode: the WHOLE frame's blocks in three varint calls
            # (flat concatenated buffers), mirroring the core kernel's
            # chunked batch_decode (query.py) — the round-1 per-block
            # Python loop made the indexed phrase path lose to a full scan
            ns = pdf["n"].to_numpy(np.int64)
            noc = pdf["n_occ"].to_numpy(np.int64)
            total_n = int(ns.sum())
            total_occ = int(noc.sum())
            if total_n == 0 or total_occ == 0:
                continue
            base = pdf["base"].to_numpy(np.int64)
            gaps = varint_decode(
                b"".join(pdf["doc_ids_packed"]), total_n
            ).astype(np.int64)
            counts = varint_decode(
                b"".join(pdf["counts_packed"]), total_n
            ).astype(np.int64)
            deltas = varint_decode(
                b"".join(pdf["positions_packed"]), total_occ
            ).astype(np.int64)
            # per-block doc ids: cumsum of gaps, rebased per block
            starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
            g = np.cumsum(gaps)
            before = g[starts] - gaps[starts]
            docs = g - np.repeat(before, ns) + np.repeat(base, ns)
            # per-doc positions: every doc's first occurrence is a stored
            # raw position (a cumsum reset point), so the global cumsum is
            # rebased at each doc's first-occurrence index
            occ_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            c = np.cumsum(deltas)
            doc_base = c[occ_starts] - deltas[occ_starts]
            pos = c - np.repeat(doc_base, counts)
            yield pd.DataFrame(
                {
                    "term_id": np.repeat(pdf["term_id"].to_numpy(np.int64), noc),
                    "doc_id": np.repeat(docs, counts),
                    "pos": pos,
                }
            )

    return fn


def decode_positions(
    spark: SparkSession, index_dir: str, term_ids: list[int] | None = None
) -> DataFrame:
    """(term_id, doc_id, pos) — decoded occurrence relation, optionally
    restricted to ``term_ids`` with directory-level part pruning."""
    seg = read_segments(spark, index_dir)
    pos = read_table(spark, index_dir, "positions")
    if term_ids is not None:
        dct = read_table(spark, index_dir, "dictionary")
        salts = {
            int(r.term_id): int(r.n_salts)
            for r in dct.filter(F.col("term_id").isin(list(term_ids)))
            .select("term_id", "n_salts")
            .collect()
        }
        parts = _parts_for(spark, salts, int(seg["n_parts"]))
        pos = pos.filter(
            F.col("part_id").isin(parts) & F.col("term_id").isin(list(term_ids))
        )
    return pos.mapInPandas(
        _decode_positions_map_fn(), schema="term_id long, doc_id long, pos long"
    )


def _parts_for(spark: SparkSession, salts: dict[int, int], n_parts: int) -> list[int]:
    """part_ids holding any (term_id, salt) pair — resolved driver-side
    with the bit-exact python twin of pmod(xxhash64(...)) (rows = Σ
    n_salts of the *queried* terms only, never corpus-sized)."""
    from .storage import hash_parts

    pairs = [(t, s) for t, ns in salts.items() for s in range(ns)]
    if not pairs:
        return []
    return hash_parts(pairs, n_parts)


def _occurrences_for_terms(
    spark: SparkSession, index_dir: str, terms: tuple[str, ...]
) -> tuple[DataFrame | None, dict[str, int]]:
    """Decode the positional occurrences of ``terms``: (occ, term→term_id).

    ``occ`` is a (term_id, doc_id, pos) DataFrame over ONLY the queried
    terms' blocks (directory-pruned to their part_ids — one driver job
    resolves term_ids AND the pruned part set: the salt explode + xxhash64
    ride the same tiny collect). ``occ`` is None when any term is OOV —
    no positional query over all of ``terms`` can match."""
    if not has_positions(index_dir):
        raise ValueError(f"index at {index_dir} has no positions feature")
    seg = read_segments(spark, index_dir)
    dct = read_table(spark, index_dir, "dictionary")
    tid_rows = (
        dct.filter(F.col("term").isin(list(set(terms))))
        .select(
            "term",
            "term_id",
            F.explode(F.sequence(F.lit(0), F.col("n_salts") - 1)).alias("salt"),
        )
        .withColumn(
            "part_id",
            F.pmod(F.xxhash64("term_id", "salt"), F.lit(int(seg["n_parts"])))
            .cast("int"),
        )
        .collect()
    )
    tids = {r.term: r.term_id for r in tid_rows}
    if len(tids) < len(set(terms)):
        return None, tids
    parts = sorted({int(r.part_id) for r in tid_rows})
    pos = read_table(spark, index_dir, "positions").filter(
        F.col("part_id").isin(parts)
        & F.col("term_id").isin([int(v) for v in tids.values()])
    )
    occ = pos.mapInPandas(
        _decode_positions_map_fn(), schema="term_id long, doc_id long, pos long"
    )
    return occ, tids


def phrase_count_indexed(
    spark: SparkSession, index_dir: str, *terms: str
) -> DataFrame:
    """(doc_id, n_phrase) — docs containing the exact phrase ``terms``
    (adjacent, in order), answered from the positional feature. Must equal
    the brute-force ``operators.phrase.phrase_count`` exactly."""
    if len(terms) < 2:
        raise ValueError("phrase needs >= 2 terms")
    occ, tids = _occurrences_for_terms(spark, index_dir, terms)
    if occ is None:
        return spark.createDataFrame([], "doc_id long, n_phrase long")

    # decode ONCE, co-locate by doc (one narrow shuffle of the queried
    # terms' occurrences), then intersect ALL docs' positional sets in one
    # vectorized pass per phrase slot: occurrences are encoded as
    # (doc_id << POS_BITS | shifted position) keys, slot i's keys are the
    # positions minus i, and the phrase matches are the n-way sorted-set
    # intersection — no per-group pandas overhead (a per-doc applyInPandas
    # measured ~5 ms/group: thousands of matching docs made the index path
    # LOSE to the brute-force scan), no re-execution of the decode subtree
    # per slot (the n-way self-join shape did exactly that).
    POS_BITS = 21  # positions per doc < 2M; doc_id < 2^42
    slot_tids = [int(tids[t]) for t in terms]
    n_slots = len(slot_tids)

    def match_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        batches = [p for p in it]
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True)
        t = pdf["term_id"].to_numpy(np.int64)
        d = pdf["doc_id"].to_numpy(np.int64)
        p = pdf["pos"].to_numpy(np.int64)
        # pack-width guard: position bits must not bleed into doc bits —
        # a silent overflow would return WRONG phrase counts, so fail loudly
        # (a >2M-token doc wants the brute-force join path instead)
        if len(p) and int(p.max()) + n_slots >= (1 << POS_BITS):
            raise ValueError(
                f"phrase kernel overflow: max position {int(p.max())} + "
                f"{n_slots} slots >= 2^{POS_BITS}; split the doc or use "
                "the brute-force phrase path"
            )
        if len(d) and int(d.max()) >= (1 << (63 - POS_BITS)):
            raise ValueError(
                f"phrase kernel overflow: doc_id {int(d.max())} >= "
                f"2^{63 - POS_BITS}"
            )
        cur = None
        for i, tid in enumerate(slot_tids):
            m = t == tid
            # +n_slots keeps shifted positions strictly positive
            keys = (d[m] << POS_BITS) | (p[m] - i + n_slots)
            cur = keys if cur is None else np.intersect1d(cur, keys)
            if len(cur) == 0:
                return
        docs, counts = np.unique(cur >> POS_BITS, return_counts=True)
        yield pd.DataFrame({"doc_id": docs, "n_phrase": counts.astype(np.int64)})

    return occ.repartition(shuffle_n(occ), "doc_id").mapInPandas(
        match_fn, schema="doc_id long, n_phrase long"
    )


def proximity_count_indexed(
    spark: SparkSession,
    index_dir: str,
    t1: str,
    t2: str,
    *,
    slop: int = 3,
    ordered: bool = False,
) -> DataFrame:
    """(doc_id, n_prox) — proximity ("NEAR") matching from the positional
    feature: pairs of occurrences of ``t1``/``t2`` within ``slop`` positions
    (``ordered=True`` requires t2 to follow t1). Must equal the brute-force
    ``operators.phrase.proximity_count`` exactly.

    Kernel shape (same family as the phrase kernel above): decode the two
    terms' occurrences once, co-locate by doc, pack (doc_id << POS_BITS |
    shifted pos) keys, then count each t1 occurrence's in-window t2
    neighbors with two vectorized ``searchsorted`` probes over t2's sorted
    keys — window arithmetic cannot cross a doc boundary because shifted
    positions are strictly positive and the pack-width guard bounds
    ``pos + slop`` below 2^POS_BITS."""
    if t1 == t2:
        raise ValueError("proximity terms must differ (a position holds one term)")
    if slop < 1:
        raise ValueError(f"slop must be >= 1, got {slop}")
    occ, tids = _occurrences_for_terms(spark, index_dir, (t1, t2))
    if occ is None:
        return spark.createDataFrame([], "doc_id long, n_prox long")

    POS_BITS = 21
    tid1, tid2 = int(tids[t1]), int(tids[t2])
    off = slop + 1  # shifted positions stay > slop, so key-slop stays in-doc

    def match_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        batches = [p for p in it]
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True)
        t = pdf["term_id"].to_numpy(np.int64)
        d = pdf["doc_id"].to_numpy(np.int64)
        p = pdf["pos"].to_numpy(np.int64)
        if len(p) and int(p.max()) + off + slop >= (1 << POS_BITS):
            raise ValueError(
                f"proximity kernel overflow: max position {int(p.max())} + "
                f"slop {slop} >= 2^{POS_BITS}; use the brute-force path"
            )
        if len(d) and int(d.max()) >= (1 << (63 - POS_BITS)):
            raise ValueError(
                f"proximity kernel overflow: doc_id {int(d.max())} >= "
                f"2^{63 - POS_BITS}"
            )
        keys = (d << POS_BITS) | (p + off)
        k1 = keys[t == tid1]
        k2 = np.sort(keys[t == tid2])
        if not len(k1) or not len(k2):
            return
        lo = np.searchsorted(k2, k1 + 1 if ordered else k1 - slop, side="left")
        hi = np.searchsorted(k2, k1 + slop, side="right")
        cnt = hi - lo
        keep = cnt > 0
        if not keep.any():
            return
        docs, inv = np.unique(k1[keep] >> POS_BITS, return_inverse=True)
        n = np.bincount(inv, weights=cnt[keep].astype(np.float64))
        yield pd.DataFrame({"doc_id": docs, "n_prox": n.astype(np.int64)})

    return occ.repartition(shuffle_n(occ), "doc_id").mapInPandas(
        match_fn, schema="doc_id long, n_prox long"
    )
