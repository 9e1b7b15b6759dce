"""Driver-side pmod(xxhash64) twin must stay bit-exact with Catalyst.

The query paths prune postings directories with part ids computed in pure
Python (storage.hash_part_id) instead of a throwaway local-relation Spark
job; any divergence from the JVM expression would silently skip blocks, so
this test pins equality over edge cases and a random sweep.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from jvector_spark.index.storage import hash_part_id, hash_parts


def test_hash_part_id_matches_spark(spark):
    rng = random.Random(7)
    pairs = [
        (0, 0),
        (1, 0),
        (-1, 0),
        (-5, 3),
        ((1 << 62) + 11, 1),
        (-(1 << 62), 7),
    ] + [(rng.randrange(-(1 << 63), 1 << 63), rng.randrange(0, 64)) for _ in range(200)]
    for n_parts in (1, 2, 4, 8, 31):
        got = [hash_part_id(t, s, n_parts) for t, s in pairs]
        want = [
            r.p
            for r in spark.createDataFrame(pairs, "term_id long, salt int")
            .select(
                F.pmod(F.xxhash64("term_id", "salt"), F.lit(n_parts))
                .cast("int")
                .alias("p")
            )
            .collect()
        ]
        assert got == want, f"n_parts={n_parts}"


def test_hash_parts_distinct_sorted():
    out = hash_parts([(3, 0), (3, 1), (9, 0), (3, 0)], 4)
    assert out == sorted(set(out))
    assert all(0 <= p < 4 for p in out)
