"""Does meta-blocking WNP hold pipeline F1 on the TRANSCRIPTS payload?

BENCH/BLOCKING.md shows WNP is free on documents (cluster recall
unchanged at a 2.25x candidate cut).  Transcripts are the adversarial
case for it: the default pipeline blocks with ONE complete rule
(structural), so the multi-rule union there is structural + SNM, where
SNM's completeness is only 0.63 — i.e. ~37% of true pairs carry weight
1, exactly the weight class WNP prunes.  This study measures the
damage end-to-end: candidate cut, per-edge truth retention, and
pipeline pairwise F1 after scoring + connected components on the
pruned vs unpruned graph (transitivity can re-derive dropped edges
inside clusters, so per-edge loss overstates cluster-level loss).

Run SOLO (one Spark session): python tools/wnp_transcripts_study.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from edlib_spark.operators.blocking import (sorted_neighborhood_pairs,
                                            weighted_node_prune)  # noqa: E402
from edlib_spark.operators.canonicalize import canonicalize  # noqa: E402
from edlib_spark.operators.clustering import cluster_assignments  # noqa: E402
from edlib_spark.operators.pairs import candidate_pairs  # noqa: E402
from edlib_spark.operators.scoring import match_edges, score_pairs  # noqa: E402
from edlib_spark.plans.linkage import (LinkageConfig, build_blocks,
                                       pairwise_f1)  # noqa: E402
from edlib_spark.session import get_spark  # noqa: E402
from edlib_spark.sources.transcripts import (ensure_transcripts_parquet,
                                             ground_truth_cluster)  # noqa: E402


def main():
    spark = get_spark("wnp-study", master="local[32]",
                      shuffle_partitions=32)
    cfg = LinkageConfig()
    path = ensure_transcripts_parquet(spark, "medium")
    canon = canonicalize(spark.read.parquet(path)).localCheckpoint()

    # rule 1: the default structural blocking, as candidate pairs
    st = (candidate_pairs(build_blocks(canon, cfg),
                          cfg.hot_block_threshold, cfg.salt_group_size)
          .select("id_a", "id_b", F.lit(1).alias("bit")))
    # rule 2: SNM over the squeezed 12-char prefix (the documented
    # incomplete-on-transcripts rule, PC 0.63 at w=8)
    keyed = canon.select(
        F.col("conv_id").alias("rec_id"),
        F.substring(F.translate(F.col("full_text"), " ", ""),
                    1, cfg.snm_key_len).alias("snm_key"))
    snm = (sorted_neighborhood_pairs(keyed, "snm_key", "rec_id",
                                     cfg.snm_window)
           .select(F.least("id_a", "id_b").alias("id_a"),
                   F.greatest("id_a", "id_b").alias("id_b"),
                   F.lit(2).alias("bit")))
    graph = (st.unionByName(snm)
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_rules"))
             .localCheckpoint())

    flagged = weighted_node_prune(graph, weight_col="n_rules",
                                  emit_all=True).localCheckpoint()
    same_truth = (F.substring_index("id_a", "_", 1)
                  == F.substring_index("id_b", "_", 1))
    stats = (flagged
             .agg(F.count(F.lit(1)).alias("cand"),
                  F.sum(F.when(F.col("retained_by") > 0, 1).otherwise(0))
                  .alias("kept"),
                  F.sum(F.when(same_truth, 1).otherwise(0)).alias("truth"),
                  F.sum(F.when(same_truth & (F.col("retained_by") > 0), 1)
                        .otherwise(0)).alias("truth_kept"))
             .collect()[0])
    print(f"candidates={stats['cand']} kept={stats['kept']} "
          f"({stats['kept'] / stats['cand']:.3f}) "
          f"truth={stats['truth']} truth_kept={stats['truth_kept']} "
          f"retention={stats['truth_kept'] / stats['truth']:.4f}")

    truth = canon.select("conv_id",
                         ground_truth_cluster(F.col("conv_id"))
                         .alias("cluster_id"))

    def run(pairs, tag):
        t0 = time.time()
        scored = score_pairs(pairs.select("id_a", "id_b"), canon,
                             cfg.tau, cfg.mode).localCheckpoint()
        n_scored = scored.count()
        clusters = cluster_assignments(
            canon, match_edges(scored, cfg.tau).localCheckpoint())
        m = pairwise_f1(clusters, truth)
        wall = time.time() - t0
        print(f"{tag}: scored={n_scored} wall={wall:.1f}s "
              f"P={m['precision']:.4f} R={m['recall']:.4f} "
              f"F1={m['f1']:.4f}")
        return m, wall

    full, wall_full = run(flagged, "full graph  ")
    pruned, wall_pruned = run(flagged.where(F.col("retained_by") > 0),
                              "WNP-pruned  ")
    print(f"candidate cut {stats['cand'] / stats['kept']:.2f}x, "
          f"scorer+CC wall {wall_full:.1f}s -> {wall_pruned:.1f}s, "
          f"F1 {full['f1']:.4f} -> {pruned['f1']:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
