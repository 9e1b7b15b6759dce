"""Index maintenance: tombstone deletes and compaction.

Reference analog: ``markNodeDeleted`` tombstones + ``removeDeletedNodes``
cleanup (jvector-base/.../graph/GraphIndexBuilder.java:681-683, 692-802,
surveyed M1/B8) and the deletion test suite (TestDeletions.java:42-159).

Semantics:
- ``delete_docs`` appends doc_ids to a ``tombstones`` table — O(deletes),
  no index rewrite. Queries mask tombstoned docs *before* top-k selection
  (a deleted doc must not occupy a result slot NOR shadow a live doc).
- ``compact_index`` physically rewrites the postings without tombstoned
  docs, shrinks doc_stats/doc_map, refreshes dictionary df/cf and global
  stats, and clears the tombstone set — the FreshDiskANN-style cleanup.
  doc_ids are NOT renumbered (stable external references, like the
  reference's holes-then-renumber-at-write model); density is restored by
  a full rebuild if ever needed.

Scale notes: the tombstone set is read as a DataFrame and applied via
broadcast anti-join semantics (query side) or an executor-side numpy mask
(WAND side). A tombstone set too large to broadcast is the signal to run
``compact_index`` — same policy as the reference's cleanup threshold.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .build import POSTINGS_SCHEMA, _encode_map_fn
from .query import decode_postings
from .storage import (
    read_segments,
    read_table,
    shuffle_n,
    table_path,
    tombstone_ids,
    update_segments,
)

__all__ = ["delete_docs", "tombstone_ids", "compact_index", "set_bm25_params", "verify_index"]

TOMBSTONES = "tombstones"


def delete_docs(spark: SparkSession, index_dir: str, doc_ids) -> int:
    """Tombstone the given doc_ids (iterable of int or a 1-col DataFrame).
    Returns the number of tombstones appended."""
    if isinstance(doc_ids, DataFrame):
        df = doc_ids.select(F.col(doc_ids.columns[0]).cast("long").alias("doc_id"))
    else:
        rows = [(int(d),) for d in doc_ids]
        if not rows:
            return 0
        df = spark.createDataFrame(rows, "doc_id long")
    df = df.distinct()
    n = df.count()
    df.write.mode("append").parquet(table_path(index_dir, TOMBSTONES))
    return n


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Rewrite the index without tombstoned docs (B8 analog). Idempotent;
    no-op when there are no tombstones."""
    dead = tombstone_ids(spark, index_dir)
    if not dead:
        return {"docs_removed": 0}
    seg = read_segments(spark, index_dir)
    if seg.get("layout") == "doc":
        raise NotImplementedError(
            "compact_index does not support the doc-partitioned layout yet "
            "(its part_id is the doc bucket, not a (term_id, salt) hash); "
            "rebuild via build_doc_partitioned over the live corpus"
        )
    n_parts = int(seg["n_parts"])
    block_size = int(seg["block_size"])
    dead_df = F.broadcast(
        spark.createDataFrame([(int(d),) for d in sorted(dead)], "doc_id long")
    )

    # decode → drop dead docs → re-encode (streams through the same
    # vectorized encoder as the build; doc order within (term, salt) is
    # preserved so blocks stay sorted and doc-range-disjoint)
    live = decode_postings(
        spark, index_dir, extra_cols=["salt"]
    ).join(dead_df, "doc_id", "left_anti")
    enriched = live.withColumn(
        "part_id", F.pmod(F.xxhash64("term_id", "salt"), F.lit(n_parts)).cast("int")
    ).select("part_id", "term_id", "salt", "doc_id", "tf", "dl")
    obs = Observation("compact_metrics")
    blocks = (
        enriched.repartition(shuffle_n(enriched), "part_id", "term_id", "salt")
        .mapInPandas(
            _encode_map_fn(block_size, carry_part_id=True),
            schema="part_id int, " + POSTINGS_SCHEMA,
        )
        .observe(
            obs,
            F.coalesce(F.sum("n"), F.lit(0)).alias("postings"),
            (
                F.coalesce(F.sum(F.length("doc_ids_packed")), F.lit(0))
                + F.coalesce(F.sum(F.length("tfs_packed")), F.lit(0))
                + F.coalesce(F.sum(F.length("dls_packed")), F.lit(0))
            ).alias("bytes"),
        )
    )
    tmp = table_path(index_dir, "postings__compact")
    blocks.write.mode("overwrite").partitionBy("part_id").parquet(tmp)
    old = table_path(index_dir, "postings")
    shutil.rmtree(old)
    os.rename(tmp, old)
    postings_live = int(obs.get["postings"])
    bytes_live = int(obs.get["bytes"])

    # shrink doc_stats / doc_map
    for name in ("doc_stats", "doc_map"):
        path = table_path(index_dir, name)
        if not os.path.exists(path):
            continue
        kept = spark.read.parquet(path).join(dead_df, "doc_id", "left_anti")
        tmp = path + "__compact"
        kept.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path)
        os.rename(tmp, path)

    # refresh dictionary df/cf from the live postings (drops empty terms'
    # counts to 0 but keeps their term_ids stable)
    live2 = decode_postings(spark, index_dir)
    stats = live2.groupBy("term_id").agg(
        F.count("*").cast("long").alias("df2"),
        F.sum("tf").cast("long").alias("cf2"),
    )
    dct = read_table(spark, index_dir, "dictionary")
    new_dct = (
        dct.join(stats, "term_id", "left")
        .select(
            "term",
            "term_id",
            F.coalesce(F.col("df2"), F.lit(0)).alias("df"),
            F.coalesce(F.col("cf2"), F.lit(0)).alias("cf"),
            "n_salts",
        )
    )
    tmp = table_path(index_dir, "dictionary__compact")
    new_dct.write.mode("overwrite").parquet(tmp)
    old = table_path(index_dir, "dictionary")
    shutil.rmtree(old)
    os.rename(tmp, old)

    # refresh global stats (all other segment columns preserved verbatim);
    # clear tombstones
    total = read_table(spark, index_dir, "doc_stats").agg(
        F.count("*").cast("long"), F.avg("dl")
    ).collect()[0]
    update_segments(spark, index_dir, n_docs=int(total[0]), avgdl=float(total[1]))
    # build_lineage is REWRITTEN with post-compaction totals so verify_index
    # reconciles against what is actually on disk (a compacted index must
    # not raise a false corruption alarm against pre-compaction lineage)
    spark.createDataFrame(
        [(-1, int(total[0]), postings_live, bytes_live, "compacted")],
        "part_id int, docs_indexed long, postings_emitted long, "
        "bytes_compressed long, status string",
    ).write.mode("overwrite").parquet(table_path(index_dir, "build_lineage"))
    shutil.rmtree(table_path(index_dir, TOMBSTONES), ignore_errors=True)
    return {
        "docs_removed": len(dead),
        "postings_live": postings_live,
        "n_docs": int(total[0]),
    }


def set_bm25_params(spark: SparkSession, index_dir: str, k1: float, b: float) -> dict:
    """Re-parameterize scoring without touching a single posting block —
    the format-v2 payoff of deriving block bounds at query time from
    (max_tf, min_dl) + current segment stats. Reference analog:
    ``GraphIndexBuilder.rescore`` rebuilds every edge score under a new
    score provider (GraphIndexBuilder.java:394-437, B9); here the same
    capability is one metadata row rewrite, because nothing baked the old
    (k1, b) into the index. Every query after this must equal a brute-force
    BM25 with the new parameters exactly (tested). Works on BOTH layouts:
    ``update_segments`` preserves every non-updated column, so a
    doc-partitioned index keeps its ``layout``/``bucket_width`` metadata."""
    update_segments(spark, index_dir, k1=float(k1), b=float(b))
    return {"k1": float(k1), "b": float(b)}


def verify_index(spark: SparkSession, index_dir: str) -> dict:
    """Integrity check (reference analog: CRC over written node records,
    OnDiskGraphIndexWriter.java:369, surveyed M3): recompute posting count
    and compressed-byte totals from the postings table (meta/length-only
    columns — the packed payload lengths come from Parquet without
    decoding) and reconcile against the build_lineage totals recorded at
    write time; also fold a content hash over the packed payloads so bit
    rot, not just truncation, is caught. Returns a report dict with
    ``ok``; callers decide whether to rebuild."""
    lineage = read_table(spark, index_dir, "build_lineage")
    want = lineage.agg(
        F.sum("postings_emitted").alias("postings"),
        F.sum("bytes_compressed").alias("bytes"),
    ).collect()[0]
    p = read_table(spark, index_dir, "postings")
    got = p.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("postings"),
        (
            F.coalesce(F.sum(F.length("doc_ids_packed")), F.lit(0))
            + F.coalesce(F.sum(F.length("tfs_packed")), F.lit(0))
            + F.coalesce(F.sum(F.length("dls_packed")), F.lit(0))
        ).alias("bytes"),
        # order-independent content fold: XOR of per-block xxhash64 values
        # (commutative and overflow-free, unlike a long sum under ANSI SQL)
        F.bit_xor(
            F.xxhash64("term_id", "salt", "block_id", "doc_ids_packed",
                       "tfs_packed", "dls_packed")
        ).alias("content_fold"),
    ).collect()[0]
    report = {
        "postings_expected": int(want["postings"] or 0),
        "postings_found": int(got["postings"] or 0),
        "bytes_expected": int(want["bytes"] or 0),
        "bytes_found": int(got["bytes"] or 0),
        "content_fold": int(got["content_fold"] or 0),
    }
    report["ok"] = (
        report["postings_expected"] == report["postings_found"]
        and report["bytes_expected"] == report["bytes_found"]
    )
    return report
