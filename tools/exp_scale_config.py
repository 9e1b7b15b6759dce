"""Interleaved scaling-pair trials for alternative N→4N configs (round 5).

Runs bench.py --job legs (the exact subprocess the artifact's scaling
section uses: fresh quota'd JVM, 32 shuffle partitions, 1000-query WAND
batch) at a chosen (lo, hi) core pair over a chosen corpus, interleaved
lo,hi,lo,hi so host windows land on pairs, and prints per-pair build/query
efficiencies plus the busy-core records that expose cycle inflation.

Usage: python tools/exp_scale_config.py <src> <workdir> <lo> <hi> <reps>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def leg(cores: int, src: str, workdir: str, pin_base: int) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_INCLUDE_DP": "0",
        "SPARK_GRAFT_CPUSET": ",".join(
            str((pin_base + j) % (os.cpu_count() or 32)) for j in range(cores)
        ),
    }
    p = subprocess.run(
        [sys.executable, BENCH, "--job", str(cores), src, workdir],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("JOBRESULT ")]
    if not lines:
        raise RuntimeError(f"leg cores={cores} failed: {p.stderr[-800:]}")
    return json.loads(lines[-1][len("JOBRESULT "):])


def main() -> None:
    src, workdir = sys.argv[1], sys.argv[2]
    lo_c, hi_c, reps = int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
    ratio = hi_c / lo_c
    effs = []
    for rep in range(reps):
        base = (rep * (lo_c + hi_c + 3)) % 24
        lo = leg(lo_c, src, workdir, base)
        hi = leg(hi_c, src, workdir, base + lo_c + 1)
        pair = {
            "rep": rep,
            "build_eff": round(
                hi["turns_per_sec"] / (ratio * lo["turns_per_sec"]), 3),
            "query_eff": round(hi["qps"] / (ratio * lo["qps"]), 3),
            "lo_tps": lo["turns_per_sec"], "hi_tps": hi["turns_per_sec"],
            "lo_cpu": lo["cpu_build"], "hi_cpu": hi["cpu_build"],
            "lo_phases": lo.get("build_phase_secs"),
            "hi_phases": hi.get("build_phase_secs"),
        }
        effs.append(pair["build_eff"])
        print(json.dumps(pair), flush=True)
    print(json.dumps({
        "lo_cores": lo_c, "hi_cores": hi_c, "n": len(effs),
        "build_effs": sorted(effs),
    }))


if __name__ == "__main__":
    main()
