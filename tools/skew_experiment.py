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


def main_dedup(hot_docs: int = 4096) -> None:
    """The same experiment through the GRADED dedup path: one planted
    hot LSH bucket (``hot_docs`` identical documents -> every band key
    collides) through minhash_neardup_pairs end-to-end, salting ON vs
    OFF.  Unlike the raw candidate_pairs run above, this includes the
    exact-Jaccard verify joins and the renormalization — the full
    operator a training pipeline calls."""
    import time as _time

    from pyspark.sql import functions as F

    from edlib_spark.operators.dedup import minhash_neardup_pairs
    from edlib_spark.session import get_spark

    spark = get_spark("skew-dedup", master="local[32]",
                      shuffle_partitions=64)
    hot = spark.range(hot_docs).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again and "
              "again while the template boilerplate repeats verbatim")
         .alias("text"))
    noise = spark.range(2000).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.repeat(F.concat(F.lit("q"), (F.col("id") * 7919).cast("string"),
                          F.lit("w ")), 10).alias("text"))
    docs = hot.unionByName(noise).repartition(64).cache()
    docs.count()

    expected_hot = hot_docs * (hot_docs - 1) // 2
    for tag, threshold in (("salted (threshold=256, groups of 128)", 256),
                           ("unsalted (hot bucket in one task/band)",
                            1 << 30)):
        t0 = _time.perf_counter()
        out = minhash_neardup_pairs(docs, hot_block_threshold=threshold,
                                    salt_group_size=128)
        n_hot = out.where(F.col("id_b") < hot_docs).count()
        secs = _time.perf_counter() - t0
        assert n_hot == expected_hot, (n_hot, expected_hot)
        print(f"dedup-path {tag}: {n_hot:,} hot pairs in {secs:.1f}s")
    spark.stop()


if __name__ == "__main__":
    if "--dedup" in sys.argv:
        main_dedup()
    else:
        main()
