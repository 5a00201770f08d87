"""Pairwise scoring stage: join texts to candidate pairs, prune, score.

Plan shape (deliberate):
  pairs (id_a, id_b)
    join canon (broadcast when small)            -- texts attached twice
    filter abs(len_a - len_b) <= k               -- the reference's
        k < |tlen-qlen| shortcut (edlib.cpp:744-747) lifted to a Catalyst
        predicate: pairs are pruned JVM-side before any Python runs
    repartition + sortWithinPartitions(max_len)  -- Arrow batches get
        similar-length pairs (numpy padding waste ~ max-min in batch)
    edit_distance pandas UDF (batched Myers)     -- per-pair k bound
    norm_distance + match filter
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.alignment import edit_distance, norm_distance


def score_pairs(pairs: DataFrame, canon: DataFrame, tau: float = 0.2,
                mode: str = "NW", length_sort: bool = True) -> DataFrame:
    """(id_a, id_b, len_a, len_b, edit_distance, norm_distance)."""
    a = canon.select(F.col("conv_id").alias("id_a"),
                     F.col("full_text").alias("text_a"),
                     F.col("text_len").alias("len_a"))
    b = canon.select(F.col("conv_id").alias("id_b"),
                     F.col("full_text").alias("text_b"),
                     F.col("text_len").alias("len_b"))
    df = pairs.join(a, "id_a").join(b, "id_b")

    max_len = F.greatest("len_a", "len_b")
    k = F.ceil(F.lit(float(tau)) * max_len).cast("int")
    df = df.where(F.abs(F.col("len_a") - F.col("len_b")) <= k)
    if length_sort:
        df = df.sortWithinPartitions(max_len)

    df = df.withColumn("edit_distance",
                       edit_distance(F.col("text_a"), F.col("text_b"),
                                     mode=mode, k=k))
    df = df.withColumn(
        "norm_distance",
        norm_distance(F.col("edit_distance"), F.col("len_a"),
                      F.col("len_b")))
    return df.select("id_a", "id_b", "len_a", "len_b", "edit_distance",
                     "norm_distance")


def pending_pairs(pairs: DataFrame, done: DataFrame) -> DataFrame:
    """Pair-level resume delta: candidate pairs not yet scored.

    ``done``: any DataFrame carrying (id_a, id_b) of already-scored
    pairs (e.g. the scored_pairs checkpoint of an interrupted run).
    A left-anti join — the shuffle hashes only the id columns, so the
    delta costs nothing text-wise; downstream scoring then runs on the
    remainder and the union of old + new scored pairs is complete.
    """
    return pairs.join(done.select("id_a", "id_b"), ["id_a", "id_b"],
                      "left_anti")


def match_edges(scored: DataFrame, tau: float = 0.2) -> DataFrame:
    """(id_a, id_b) edges whose normalized distance is within threshold.

    The scorer already enforced dist <= k = ceil(tau*max_len) via the
    kernel's k bound (dist == -1 otherwise), so this is a residual
    filter on the exact normalized value.
    """
    return (scored
            .where((F.col("edit_distance") >= 0)
                   & (F.col("norm_distance") <= F.lit(float(tau))))
            .select("id_a", "id_b"))
