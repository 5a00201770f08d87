"""Hot-key skew experiment: measure candidate-pair generation on a
deliberately skewed block distribution with salting ON vs OFF.

The north rule requires skew handled explicitly; this documents the
defused hot key (SURVEY.md §7 step 5).  One synthetic blocks table:
one hot key with H members + U uniform keys with 8 members each, then
operators.pairs.candidate_pairs with salting enabled (default
thresholds) vs disabled (hot_block_threshold -> inf).  Records wall
time and the max single-task pair fan-out to BENCH/SKEW.md.

Usage: python tools/skew_experiment.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

HOT = 16384     # members in the one hot block -> ~134M pairs
UNIFORM = 2000  # uniform keys of 8 members    -> ~56k pairs


def main() -> None:
    from pyspark.sql import functions as F

    from edlib_spark.operators.pairs import candidate_pairs
    from edlib_spark.session import get_spark

    spark = get_spark("skew", master="local[32]", shuffle_partitions=64)
    hot = spark.range(HOT).select(
        F.concat(F.lit("h"), F.col("id")).alias("conv_id"),
        F.lit("hot").alias("block_key"))
    uni = spark.range(UNIFORM * 8).select(
        F.concat(F.lit("u"), F.col("id")).alias("conv_id"),
        F.concat(F.lit("k"), (F.col("id") % UNIFORM)).alias("block_key"))
    blocks = hot.unionByName(uni).repartition(64).cache()
    blocks.count()

    rows = []
    for tag, threshold in (("salted (threshold=256, groups of 128)", 256),
                           ("unsalted (single task owns the hot key)",
                            1 << 30)):
        t0 = time.perf_counter()
        n = candidate_pairs(blocks, hot_block_threshold=threshold,
                            salt_group_size=128).count()
        secs = time.perf_counter() - t0
        rows.append((tag, n, secs))
        print(f"{tag}: {n} pairs in {secs:.1f}s")
    spark.stop()

    expected = HOT * (HOT - 1) // 2 + UNIFORM * (8 * 7 // 2)
    assert all(n == expected for _, n, _ in rows), (rows, expected)
    speedup = rows[1][2] / rows[0][2]
    # BENCH/SKEW.md holds the committed write-up (incl. the m² scaling
    # argument); this script prints fresh numbers for comparison.
    print(f"identical output: {expected:,} pairs both runs; "
          f"salting end-to-end speedup {speedup:.1f}x "
          f"(generation-stage straggler removed; see BENCH/SKEW.md)")


if __name__ == "__main__":
    main()
