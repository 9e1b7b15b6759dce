"""Structured-Streaming ingest: continuously index arriving transcript
turns, with exactly-once microbatch commits and streaming corpus stats.

Reference analog: jvector's IPC serve loop accepts WRITE/BULKLOAD commands
that append vectors to a live index (jvector-examples/.../IPCService.java:
80-159), and ``GraphIndexBuilder.buildAndMergeNewNodes`` merges new nodes
into an existing on-disk graph (GraphIndexBuilder.java:1015-1057). The
Spark-native shape is not a socket daemon but a Structured Streaming job:

    files land in a directory (or Kafka topic on a real cluster)
      → ``readStream`` with the fixed transcript schema
      → ``foreachBatch``: each microbatch is appended to the index via
        :func:`jvector_spark.index.extend.extend_index`

Delivery guarantee: Spark's streaming checkpoint tracks *offsets*;
foreachBatch itself is at-least-once on failure. Replays of COMMITTED
batches are deduplicated via a ``stream_lineage`` table inside the index
dir (the streaming twin of the build's per-partition ``build_lineage``
checkpoints, B11/B12, CheckpointManager.java:33-112). Because an extend is
a non-atomic multi-table mutation, a crash strictly inside it is made
*detectable* (pending-without-complete marker → fail-stop on restart)
rather than silently double-applied; see ``stream_index_transcripts``.

Scale notes: each microbatch runs the same salted repartition-by-term
encode pipeline as the batch build, so a 1000-executor cluster ingests each
batch with full parallelism; the per-batch dictionary merge touches only
terms present in the batch. Small delta posting files accumulate per batch
— ``index.maintenance.compact_index`` is the matching rewrite job (run it
on a schedule, like any LSM-ish store).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def transcript_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of transcript turns (the sandbox stand-in for a
    Kafka topic; swapping the source is a one-line change)."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.parquet(source_dir)


_LINEAGE_SCHEMA = (
    "batch_id long, docs_indexed long, postings_emitted long, "
    "bytes_compressed long, status string"
)


def _batch_states(
    spark: SparkSession, index_dir: str
) -> tuple[set[int], set[int], set[int]]:
    """(committed, in_flight, staged) batch ids from stream_lineage. A
    batch is committed iff a 'complete' row exists; a 'pending' row without
    a matching 'complete' row means a previous attempt crashed MID-extend —
    the index may hold a partial delta. A 'staged' row means the batch's
    raw rows are durably parked in ``stream_staging`` awaiting the next
    amortized merge (see ``flush_staged``)."""
    path = os.path.join(index_dir, "stream_lineage")
    if not os.path.exists(path):
        return set(), set(), set()
    # mergeSchema: a lineage dir written by the pre-status 4-column format
    # (or a mix of old and new files) must not have its schema sampled from
    # one file; rows lacking a status column are treated as committed —
    # the old format only ever wrote a row AFTER a successful extend.
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if "status" not in df.columns:
        df = df.withColumn("status", F.lit("complete"))
    rows = df.select(
        "batch_id", F.coalesce("status", F.lit("complete")).alias("status")
    ).collect()
    complete = {r.batch_id for r in rows if r.status == "complete"}
    pending = {r.batch_id for r in rows if r.status == "pending"} - complete
    staged = {r.batch_id for r in rows if r.status == "staged"} - complete
    return complete, pending, staged


def _record_batch(
    spark: SparkSession,
    index_dir: str,
    batch_id: int,
    metrics: dict,
    status: str = "complete",
) -> None:
    spark.createDataFrame(
        [
            (
                int(batch_id),
                int(metrics.get("docs_added", metrics.get("docs", 0)) or 0),
                int(metrics.get("postings_emitted", 0) or 0),
                int(metrics.get("bytes_compressed", 0) or 0),
                status,
            )
        ],
        _LINEAGE_SCHEMA,
    ).write.mode("append").parquet(os.path.join(index_dir, "stream_lineage"))


def staged_docs(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The not-yet-merged staged rows (the LSM-memtable analog): turns that
    are durably ingested but not yet visible to the inverted index. Callers
    needing read-your-writes between merges union a brute-force BM25 over
    this (small) frame with the indexed result — exactly how an LSM store
    serves its memtable next to its SSTables. Returns None when nothing is
    staged."""
    staging = os.path.join(index_dir, "stream_staging")
    if not os.path.isdir(staging) or not os.listdir(staging):
        return None
    committed, _, staged = _batch_states(spark, index_dir)
    if not staged:
        return None
    return (
        spark.read.parquet(staging)
        .filter(F.col("batch_id").isin([int(b) for b in staged]))
    )


def _prune_committed_staging(index_dir: str, committed: set[int]) -> int:
    """Reclaim orphaned ``stream_staging/batch_id=N`` dirs whose batch is
    already committed — a crash between flush_staged's 'complete' lineage
    write and its staging cleanup would otherwise leak those dirs forever
    (unbounded disk growth across restarts). Idempotent; returns the number
    of dirs removed."""
    import shutil

    staging = os.path.join(index_dir, "stream_staging")
    if not os.path.isdir(staging):
        return 0
    removed = 0
    for name in os.listdir(staging):
        if not name.startswith("batch_id="):
            continue
        try:
            bid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if bid in committed:
            shutil.rmtree(os.path.join(staging, name), ignore_errors=True)
            removed += 1
    return removed


def flush_staged(
    spark: SparkSession,
    index_dir: str,
    order_cols: list[str] | None = None,
    doc_map_cols: list[str] | None = None,
) -> dict:
    """Merge ALL staged batches into the index in ONE ``extend_index``
    delta — the amortization point of the reference's cleanup-threshold
    idiom (GraphIndexBuilder.java:475-511: inserts accumulate, one cleanup
    pass merges). The per-batch fixed costs (full dictionary outer-join +
    rewrite, segments refresh, lineage scans) are paid once per flush
    instead of once per microbatch.

    Crash semantics match the per-batch path: 'pending' rows for every
    staged batch are written BEFORE the (non-atomic) extend and 'complete'
    rows after, so a crash mid-merge fail-stops the stream on restart.
    Dense doc_ids order by (batch_id, *order_cols) — identical to the ids
    the same batches would have received if merged one at a time."""
    order_cols = order_cols or ["conv_id", "turn_idx"]
    from ..index.extend import extend_index

    committed, in_flight, staged = _batch_states(spark, index_dir)
    _prune_committed_staging(index_dir, committed)
    if in_flight:
        raise RuntimeError(
            f"stream_lineage shows batch(es) {sorted(in_flight)} pending "
            "with no complete marker: a previous run crashed mid-extend. "
            "Rebuild or restore the index before flushing."
        )
    if not staged:
        return {"docs_added": 0, "batches_merged": 0}
    ids = sorted(int(b) for b in staged)
    for b in ids:
        _record_batch(spark, index_dir, b, {}, status="pending")
    staging = os.path.join(index_dir, "stream_staging")
    delta = (
        spark.read.parquet(staging)
        .filter(F.col("batch_id").isin(ids))
    )
    m = extend_index(
        delta,
        index_dir,
        order_cols=["batch_id", *order_cols],
        doc_map_cols=doc_map_cols,
    )
    # delta metrics land on the first merged batch's row; the others carry
    # zeros (the per-flush totals are what monitoring reads)
    for b in ids:
        _record_batch(spark, index_dir, b, m if b == ids[0] else {},
                      status="complete")
    import shutil

    for b in ids:
        shutil.rmtree(os.path.join(staging, f"batch_id={b}"), ignore_errors=True)
    m["batches_merged"] = len(ids)
    return m


def stream_index_transcripts(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    order_cols: list[str] | None = None,
    doc_map_cols: list[str] | None = None,
    n_parts: int = 8,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    merge_every: int | None = None,
):
    """Run (or resume) the streaming index build. With
    ``available_now=True`` the query drains everything currently in
    ``source_dir`` and stops — rerunning later picks up only new files
    (incremental ingest); with ``False`` it keeps running on the default
    trigger. Returns the (already awaited, if availableNow) StreamingQuery.

    Microbatch semantics: the first ever batch creates the index; every
    subsequent batch is an :func:`extend_index` delta whose doc_ids continue
    densely above the existing corpus.

    ``merge_every=M`` switches to AMORTIZED ingest once the index exists:
    each microbatch is durably parked in ``stream_staging`` (one parquet
    append — no dictionary merge, no segments rewrite), and every M-th
    staged batch triggers one :func:`flush_staged` merge covering all of
    them. Staged-but-unmerged turns are not yet visible to the inverted
    index; :func:`staged_docs` exposes them for memtable-style union
    queries, and a final :func:`flush_staged` (or the next threshold
    crossing) folds them in. This trades a bounded visibility delay for
    per-wave cost ≈ one append — the fix for per-microbatch fixed costs
    dominating ingest throughput at small wave sizes.

    Delivery guarantee (honest version): exactly-once **for committed
    batches** with fail-stop on a detected partial batch. A 'pending'
    lineage row is written BEFORE the (non-atomic, multi-table) extend
    mutates the index and a 'complete' row after; replay of a completed
    batch is skipped (idempotent), while a pending row with no matching
    complete row proves a crash mid-extend — the index may hold a partial
    delta, so ingest raises instead of silently double-appending postings
    (which would inflate n_docs and scores). Recovery: rebuild the index
    (or restore the index dir from a snapshot) and restart the stream; the
    streaming checkpoint replays only unconsumed source files.
    """
    order_cols = order_cols or ["conv_id", "turn_idx"]
    from ..index.build import build_index
    from ..index.extend import extend_index
    from ..operators.doc_ids import assign_dense_ids

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        if batch.isEmpty():
            return
        committed, in_flight, staged = _batch_states(s, index_dir)
        _prune_committed_staging(index_dir, committed)
        if batch_id in committed or batch_id in staged:
            return  # replayed after failure — already durably applied/staged
        if in_flight:
            raise RuntimeError(
                f"stream_lineage shows batch(es) {sorted(in_flight)} pending "
                "with no complete marker: a previous run crashed mid-extend "
                "and the index may hold a partial delta. Rebuild the index "
                "(or restore it) before restarting the stream."
            )
        index_exists = os.path.exists(
            os.path.join(index_dir, "segments", "_SUCCESS")
        )
        if merge_every is not None and index_exists:
            # amortized path: park the batch's raw rows in its OWN staging
            # partition (idempotent overwrite — a crash mid-write is healed
            # by the replay, the 'staged' marker lands only after success),
            # then merge once the threshold is crossed. Per-batch cost
            # drops to one parquet append; the dictionary/segments fixed
            # costs are paid once per merge_every batches (the reference's
            # cleanup-threshold idiom, GraphIndexBuilder.java:475-511).
            # hive-style subdir: partition discovery supplies the
            # ``batch_id`` column at read time (no column in the files)
            batch.write.mode("overwrite").parquet(
                os.path.join(index_dir, "stream_staging", f"batch_id={batch_id}")
            )
            _record_batch(s, index_dir, batch_id, {}, status="staged")
            if len(staged) + 1 >= int(merge_every):
                flush_staged(s, index_dir, order_cols, doc_map_cols)
            return
        _record_batch(s, index_dir, batch_id, {}, status="pending")
        # stable within-batch ordering: files may arrive in any order, the
        # dense-id assignment is always over the declared natural key
        if index_exists:
            m = extend_index(
                batch, index_dir, order_cols=order_cols, doc_map_cols=doc_map_cols
            )
        else:
            docs = assign_dense_ids(batch, order_cols, "doc_id")
            m = build_index(
                docs, index_dir, doc_map_cols=doc_map_cols, n_parts=n_parts
            )
            m["docs_added"] = batch.count()
        _record_batch(s, index_dir, batch_id, m, status="complete")

    stream = transcript_stream(spark, source_dir, max_files_per_trigger)
    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def streaming_role_stats(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over the turn stream: turns and
    distinct conversations per (window, role). Late rows beyond the
    watermark are dropped — the streaming analog of the engine's global
    corpus stats refresh (M2: n_docs/avgdl maintenance)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
            F.avg(F.length("text")).alias("avg_chars"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
            "n_convs",
            "avg_chars",
        )
    )


# ---------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

_PROGRESS_SCHEMA = (
    "conv_id string, turns_seen long, max_turn_idx int, last_role string"
)
_STATE_SCHEMA = "turns_seen long, max_turn_idx int, last_role string"


def conversation_progress(stream: DataFrame, timeout_conf: str = "NoTimeout") -> DataFrame:
    """Stateful per-conversation tracker: cumulative turns seen, highest
    turn_idx, and the role of the latest turn, updated per microbatch via
    ``applyInPandasWithState`` — the custom-stateful-operator pattern the
    engine uses where windowed aggregates can't express the semantics
    (analog of the reference's mutable OnHeapGraphIndex accumulating
    inserts before the immutable on-disk commit)."""
    import pandas as pd

    def update(key, pdfs, state):
        conv_id = key[0]
        turns, max_idx, last_role = (
            state.get if state.exists else (0, -1, "")
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            turns += len(pdf)
            top = pdf.loc[pdf["turn_idx"].idxmax()]
            if int(top["turn_idx"]) >= int(max_idx):
                max_idx = int(top["turn_idx"])
                last_role = str(top["role"])
        state.update((int(turns), int(max_idx), last_role))
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "turns_seen": [int(turns)],
                "max_turn_idx": [int(max_idx)],
                "last_role": [last_role],
            }
        )

    return stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=_PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )
