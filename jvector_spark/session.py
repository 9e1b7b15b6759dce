"""SparkSession factory for the engine.

Local-mode tuning notes (sandbox runs local[N] in one JVM):
- ``spark.sql.shuffle.partitions`` is set to ~cores, not the 200 default.
- AQE is enabled so skewed shuffles re-plan at runtime; explicit salting in
  the index build handles groupBy-build skew that AQE cannot (SURVEY.md P11).
- Arrow is enabled for every pandas-UDF boundary.
- Session timezone pinned to UTC so timestamps compare exactly against the
  DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# minimum free bytes before tmpfs is preferred over the default tmp dir for
# Spark scratch / bench workdirs. Shuffle spill for the sf0.1 bench peaks in
# the low GBs; 8 GB headroom keeps a concurrent pair of builds safe while
# still rejecting Docker's default 64 MB /dev/shm.
TMPFS_MIN_FREE_BYTES = 8 << 30


def _tmpfs_usable(path: str, min_free: int = TMPFS_MIN_FREE_BYTES) -> bool:
    """True when ``path`` is writable AND has ``min_free`` bytes available
    (os.statvfs) — writability alone admits tiny tmpfs mounts whose ENOSPC
    would fail jobs that plain /tmp handles."""
    if not os.access(path, os.W_OK):
        return False
    try:
        st = os.statvfs(path)
    except OSError:
        return False
    return st.f_bavail * st.f_frsize >= min_free


def get_spark(
    cores: int | str = "*",
    app_name: str = "jvector_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    ``cores`` maps to ``local[cores]``; shuffle partitions default to the
    core count (or 32 for ``*``).
    """
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores in ("*",) else int(cores)
    # Python executor workers do not inherit the driver's sys.path — make the
    # package importable on workers regardless of cwd. This is the local-mode
    # stand-in for `spark-submit --py-files jvector_spark.zip` on a cluster.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    # throughput GC: the build pipeline is allocation-heavy (tokenize +
    # shuffle) and batch-oriented — ParallelGC measured +14% build
    # throughput at 8 cores vs default G1 (ties at 32). GC threads are
    # PINNED to the session's core count: the JVM defaults them to the
    # MACHINE's cores, so co-located sessions (multi-process shard builds,
    # or executors sharing a node) otherwise storm each other with
    # 23-thread GC packs. Latency-sensitive serving can override via
    # SPARK_GRAFT_JAVA_OPTS or extra_conf["spark.driver.extraJavaOptions"].
    n_apc = (os.cpu_count() or 8) if cores in ("*",) else max(1, int(cores))
    n_gc = max(2, n_apc)
    # -XX:ActiveProcessorCount sizes EVERY internal JVM pool (GC, JIT,
    # ForkJoinPool, netty) for the session's core allocation instead of the
    # machine's — the same thing a cluster manager's cgroup tells an
    # executor JVM. Without it a "2-core" local session free-rides on
    # machine-wide JIT/GC threads, which both distorts scaling measurements
    # and storms co-located sessions.
    # -Xms = -Xmx: a growable heap makes ParallelGC commit/uncommit memory
    # on every resize, and under this sandbox's virtualized kernel that
    # mmap/fault churn is the dominant cost of co-located JVMs (measured:
    # 4 concurrent 1-core shard builds spent 650 s of *system* time in
    # 113 s of wall — 5× their user time — which a fixed pre-sized heap
    # cut to 137 s; see docs/SCALE.md). A fixed heap only reserves
    # address space up front; physical pages still fault in lazily.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    java_opts = os.environ.get(
        "SPARK_GRAFT_JAVA_OPTS",
        f"-XX:ActiveProcessorCount={n_apc} "
        f"-XX:+UseParallelGC -XX:ParallelGCThreads={n_gc} "
        f"-Xms{mem}",
    )
    # shuffle/spill scratch on tmpfs when available: this sandbox's /tmp is
    # a virtualized disk whose write path is kernel-time-heavy (the 1-core
    # scaling leg measured MORE system than user CPU; docs/SCALE.md), while
    # /dev/shm is a 126 GB tmpfs. On a real cluster this is the NVMe
    # scratch every executor gets via spark.local.dir / YARN local-dirs —
    # pointing local mode at tmpfs models that, it doesn't cheat the
    # engine's own work. Env-overridable; falls back to the default /tmp.
    # Gated on CAPACITY, not just writability (ADVICE r4): Docker's default
    # /dev/shm is 64 MB, where shuffle spill would ENOSPC a build that /tmp
    # handles fine — require several GB free. Per-pid subdirectory so files
    # leaked by a crashed JVM don't pin tmpfs RAM under one shared path
    # forever (a fresh pid gets a fresh dir; Spark removes its own tree on
    # clean shutdown).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and _tmpfs_usable("/dev/shm"):
        local_dir = f"/dev/shm/jv_spark_local_{os.getpid()}"
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.driver.extraJavaOptions", java_opts)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
