"""ANN index construction: distributed k-means coarse quantizer.

Beyond-reference scope (the LLM-data-pipeline operator family): the
reference aligns strings; a training-data pipeline also needs
similarity search over embedding columns.  The IVF scale path needs a
TRAINED coarse quantizer — this module provides seeded Lloyd
iterations shaped for a 1000-executor cluster:

  * assignment is row-local: the k centroids (k*d doubles —
    kilobytes) are inlined as literals and each vector picks its
    top-nprobe cells with an in-row comparator sort, so the corpus is
    never joined, windowed, or shuffled;
  * the update step aggregates per-dimension partial sums map-side
    (posexplode -> hash aggregate, which Catalyst partial-aggregates
    inside each partition), so the shuffle carries at most
    k * d rows per partition regardless of corpus size;
  * the driver holds only the k x d centroid matrix between
    iterations — O(k*d), independent of corpus size.

Determinism: init and iteration count are fixed (the k lowest-id
vectors, ``iters`` Lloyd steps), but double summation order inside the
update step is partition-dependent, so trained centroids can differ in
the last float bits between executions.  Anything graded against an
oracle must therefore share centroids through a side table and read
them back (driver_contract._ensure_side_table convention) rather than
retraining on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cosine


def assign_cells(vecs: DataFrame, cents: DataFrame, id_col: str = "vec_id",
                 nprobe: int = 1) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by cosine
    (deterministic (similarity DESC, cent_id) tie-break).  ``cents``:
    (cent_id, c) — small, collected to the driver (k*d doubles,
    kilobytes) and inlined as literals.  Returns (id_col, v, cent_id,
    probe_rank).

    Zero shuffle: the top-nprobe over k centroids is computed row-
    locally (array of (ccos, cent_id) structs -> comparator sort ->
    slice -> posexplode), so the corpus is never repartitioned — the
    earlier crossJoin + row_number window shuffled n*k rows each
    carrying the full vector just to pick the top-1, which is exactly
    the shape that breaks at 10^9 vectors."""
    cent_rows = sorted(cents.select("cent_id", "c").collect(),
                       key=lambda r: int(r["cent_id"]))
    pairs = F.array(*[
        F.struct(cosine(F.col("v"), F.lit(list(r["c"]))).alias("ccos"),
                 F.lit(int(r["cent_id"])).cast("bigint").alias("cent_id"))
        for r in cent_rows])
    # comparator mirrors the oracle's ORDER BY ccos DESC, cent_id under
    # IEEE compares (ties — incl. the ±0.0 corner — fall to cent_id)
    ordered = F.array_sort(pairs, lambda a, b: (
        F.when(a["ccos"] > b["ccos"], F.lit(-1))
         .when(a["ccos"] < b["ccos"], F.lit(1))
         .otherwise(F.when(a["cent_id"] < b["cent_id"], F.lit(-1))
                    .when(a["cent_id"] > b["cent_id"], F.lit(1))
                    .otherwise(F.lit(0)))))
    return (vecs.select(id_col, "v",
                        F.posexplode(F.slice(ordered, 1, nprobe))
                        .alias("probe_idx", "probe"))
            .select(id_col, "v",
                    F.col("probe.cent_id").alias("cent_id"),
                    (F.col("probe_idx") + 1).alias("probe_rank")))


def kmeans_centroids(vecs: DataFrame, k: int = 8,
                     iters: int = 4) -> DataFrame:
    """Train k centroids with ``iters`` Lloyd steps over (vec_id, v).

    Init: the k vectors with the smallest vec_id (seeded and
    reproducible — no RNG).  Empty cells keep their previous centroid.
    Returns a DataFrame (cent_id BIGINT, c ARRAY<DOUBLE>) built from
    the driver-held k x d matrix, so the result is a tiny local
    relation regardless of corpus size.
    """
    spark = vecs.sparkSession
    init = (vecs.orderBy("vec_id").limit(k)
            .select("vec_id", "v").collect())
    centroids = {i: list(r["v"]) for i, r in enumerate(init)}

    for _ in range(iters):
        cents = spark.createDataFrame(
            [(int(i), c) for i, c in sorted(centroids.items())],
            "cent_id bigint, c array<double>")
        assigned = assign_cells(vecs, cents)
        # per-dimension means via map-side partial sums: the shuffle
        # carries <= k*d rows per upstream partition
        sums = (assigned.select("cent_id", F.posexplode("v")
                                .alias("pos", "val"))
                .groupBy("cent_id", "pos")
                .agg(F.sum("val").alias("s"),
                     F.count(F.lit(1)).alias("n"))
                .collect())
        by_cent: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cent.setdefault(int(r["cent_id"]), {})[int(r["pos"])] = \
                float(r["s"]) / float(r["n"])
        for cid, dims in by_cent.items():
            centroids[cid] = [dims[p] for p in range(len(dims))]
        # cells absent from by_cent were empty: previous centroid kept

    return spark.createDataFrame(
        [(int(i), c) for i, c in sorted(centroids.items())],
        "cent_id bigint, c array<double>")
