"""Interleaved A/B harness for encode-exchange knobs (round-5 verdict #2).

Runs build-only legs as quota'd subprocesses (same containment as
bench.py's scaling legs) with variants interleaved A,B,A,B,... so a host
contention window poisons both arms equally instead of one. Prints one
JSON line per leg plus a per-variant median summary.

Usage: python tools/exp_encode_ab.py <src_parquet> <workdir> <cores> <reps>
Variants come from the VARIANTS table below.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS: dict[str, dict] = {
    "base": {},  # auto pack selection (1-col tsdd when widths fit)
    "pack2": {"env": {"JV_PACK": "2"}},  # force the two-column (ts, dd) row
    "zstd": {"conf": {"spark.io.compression.codec": "zstd"}},
    "arrow64k": {"env": {"JV_ARROW_BATCH": "65536"}},
}


def _leg_main() -> None:
    cores = int(sys.argv[2])
    src, workdir = sys.argv[3], sys.argv[4]
    conf = json.loads(os.environ.get("EXP_CONF", "{}"))
    cpuset = os.environ.get("SPARK_GRAFT_CPUSET", "")
    if cpuset:
        os.sched_setaffinity(0, {int(c) for c in cpuset.split(",")})
    import shutil
    import time

    from pyspark.sql import functions as F

    from jvector_spark.index.build import build_index_transcripts
    from jvector_spark.session import get_spark

    spark = get_spark(cores=cores, shuffle_partitions=32,
                      app_name="exp_leg", extra_conf=conf or None)
    srcdf = spark.read.parquet(src)
    srcdf.count()
    idx = os.path.join(workdir, f"exp_idx_{os.getpid()}")
    # warmup (JIT + worker pool), untimed
    sample = srcdf.filter(F.pmod(F.xxhash64("conv_id"), F.lit(12)) == 0)
    build_index_transcripts(sample, idx + "_w", ["conv_id", "turn_idx"], n_parts=2)
    shutil.rmtree(idx + "_w", ignore_errors=True)
    t0 = time.perf_counter()
    meta = build_index_transcripts(
        srcdf, idx, ["conv_id", "turn_idx"],
        doc_map_cols=["conv_id", "turn_idx"], n_parts=2,
        salt_threshold=4096, target_salt_postings=4096,
    )
    wall = time.perf_counter() - t0
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
    print("LEGRESULT " + json.dumps(
        {"build_sec": round(wall, 3), "phases": meta.get("phase_secs"),
         "postings": meta.get("postings_emitted")}))


def main() -> None:
    src, workdir = sys.argv[1], sys.argv[2]
    cores, reps = int(sys.argv[3]), int(sys.argv[4])
    names = sys.argv[5].split(",") if len(sys.argv) > 5 else list(VARIANTS)
    results: dict[str, list] = {n: [] for n in names}
    for rep in range(reps):
        for vi, name in enumerate(names):
            v = VARIANTS[name]
            base = ((rep * len(names) + vi) * (cores + 1)) % 24
            env = {
                **os.environ,
                "EXP_CONF": json.dumps(v.get("conf", {})),
                "SPARK_GRAFT_CPUSET": ",".join(
                    str((base + j) % (os.cpu_count() or 32))
                    for j in range(cores)),
                **v.get("env", {}),
            }
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg",
                 str(cores), src, workdir],
                capture_output=True, text=True, timeout=900, env=env)
            lines = [l for l in p.stdout.splitlines()
                     if l.startswith("LEGRESULT ")]
            if not lines:
                print(f"[{name} rep{rep}] FAILED: {p.stderr[-500:]}",
                      file=sys.stderr)
                continue
            r = json.loads(lines[-1][len("LEGRESULT "):])
            r["variant"], r["rep"] = name, rep
            results[name].append(r)
            print(json.dumps(r), flush=True)
    for name, rs in results.items():
        if not rs:
            continue
        walls = sorted(x["build_sec"] for x in rs)
        med = walls[len(walls) // 2]
        enc = sorted(
            x["phases"]["encode_shuffle_write"] for x in rs
            if x.get("phases"))
        print(json.dumps({
            "variant": name, "n": len(rs), "median_build_sec": med,
            "walls": walls, "encode_phases": enc}))


if __name__ == "__main__":
    if sys.argv[1] == "--leg":
        _leg_main()
    else:
        main()
