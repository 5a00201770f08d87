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

from pyspark.sql import Column, DataFrame
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


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ): the memory-compressed ANN scale path.
# A 10^9-vector index at d=64 float64 is ~512 GB of raw vectors; PQ
# stores one byte per subspace per vector (m=4 -> 4 bytes + the coarse
# cell id), and queries scan cells by table lookup (ADC) instead of
# full-dimension arithmetic.  Non-residual PQ (codebooks trained on raw
# vectors, not coarse residuals): parity-simplest, and the variant
# faiss exposes as by_residual=False.  All per-row math is Catalyst
# higher-order folds — bit-identical to DuckDB's sequential list_sum,
# which is what lets the contract hash the whole path exactly.
# ---------------------------------------------------------------------------

def _l2sq_lit(x: Column, c: list) -> Column:
    """Squared L2 distance from an array<double> column to a literal
    codeword, as the sequential left fold (p-q)^2 both engines share."""
    return F.aggregate(
        F.zip_with(x, F.lit([float(v) for v in c]),
                   lambda p, q: (p - q) * (p - q)),
        F.lit(0.0), lambda acc, v: acc + v)


def _sub(v: Column, j: int, dsub: int) -> Column:
    return F.slice(v, j * dsub + 1, dsub)


def pq_codebooks(vecs: DataFrame, m: int = 4, k: int = 16,
                 iters: int = 3) -> DataFrame:
    """Train per-subspace codebooks: split d dims into ``m`` contiguous
    subspaces, seeded Lloyd on each slice.  All m trainings are FUSED
    into one job per iteration (each vector explodes to its m
    (sub_id, nearest-code, slice) structs with every codebook inlined,
    then one per-(sub, cent, dim) partial-sum aggregate) — ``iters``
    passes over the corpus total, not ``m * iters``; the shuffle
    carries <= m*k*dsub rows per partition.  Init: the k lowest-id
    vectors' slices.  Returns (sub_id BIGINT, cent_id BIGINT,
    c ARRAY<DOUBLE>) — m*k rows, driver-held, tiny.  Same determinism
    caveat as kmeans_centroids: ride a side table for anything
    oracle-graded."""
    spark = vecs.sparkSession
    init = vecs.orderBy("vec_id").limit(k).select("v").collect()
    d = len(init[0]["v"])
    assert d % m == 0, (d, m)
    dsub = d // m
    books = {j: [(i, list(r["v"])[j * dsub:(j + 1) * dsub])
                 for i, r in enumerate(init)]
             for j in range(m)}

    for _ in range(iters):
        assigned = vecs.select(F.explode(F.array(*[
            F.struct(F.lit(j).cast("bigint").alias("sub_id"),
                     _nearest_code(_sub(F.col("v"), j, dsub),
                                   books[j]).alias("cent_id"),
                     _sub(F.col("v"), j, dsub).alias("sv"))
            for j in range(m)])).alias("a")).select("a.*")
        sums = (assigned.select("sub_id", "cent_id",
                                F.posexplode("sv").alias("pos", "val"))
                .groupBy("sub_id", "cent_id", "pos")
                .agg(F.sum("val").alias("s"),
                     F.count(F.lit(1)).alias("n"))
                .collect())
        by_cell: dict[tuple, dict[int, float]] = {}
        for r in sums:
            by_cell.setdefault((int(r["sub_id"]), int(r["cent_id"])),
                               {})[int(r["pos"])] = \
                float(r["s"]) / float(r["n"])
        for (j, cid), dims in by_cell.items():
            cents = dict(books[j])
            cents[cid] = [dims[p] for p in range(len(dims))]
            books[j] = sorted(cents.items())
        # (sub, cent) cells absent from sums were empty: codeword kept

    return spark.createDataFrame(
        [(j, int(cid), c) for j in sorted(books)
         for cid, c in books[j]],
        "sub_id bigint, cent_id bigint, c array<double>")


def _books_by_sub(book_rows) -> dict:
    """{sub_id: [(cent_id, codeword), ...] sorted by cent_id} from
    collected (sub_id, cent_id, c) rows."""
    books: dict[int, list] = {}
    for r in book_rows:
        books.setdefault(int(r["sub_id"]), []).append(
            (int(r["cent_id"]), list(r["c"])))
    return {j: sorted(cents) for j, cents in books.items()}


def _nearest_code(sub: Column, cents: list) -> Column:
    """Nearest codeword id for one subspace slice, row-locally:
    codewords inlined as literals, argmin by (l2sq ASC, cent_id) via a
    comparator sort — the zero-shuffle shape of assign_cells."""
    pairs = F.array(*[
        F.struct(_l2sq_lit(sub, c).alias("d"),
                 F.lit(int(cid)).cast("bigint").alias("cent_id"))
        for cid, c in cents])
    ordered = F.array_sort(pairs, lambda a, b: (
        F.when(a["d"] < b["d"], F.lit(-1))
         .when(a["d"] > b["d"], F.lit(1))
         .otherwise(F.when(a["cent_id"] < b["cent_id"], F.lit(-1))
                    .when(a["cent_id"] > b["cent_id"], F.lit(1))
                    .otherwise(F.lit(0)))))
    return F.element_at(ordered, 1)["cent_id"]


def pq_encode_expr(v: Column, books: dict) -> Column:
    """array<bigint> of per-subspace nearest-codeword ids."""
    codes = []
    for j in sorted(books):
        cents = books[j]
        dsub = len(cents[0][1])
        codes.append(_nearest_code(_sub(v, j, dsub), cents))
    return F.array(*codes)


def pq_lut_expr(v: Column, books: dict) -> Column:
    """array<array<double>>: per subspace (outer, sub order), the
    squared L2 from this vector's slice to every codeword (inner,
    cent_id order — so ADC can index it by code+1)."""
    luts = []
    for j in sorted(books):
        cents = books[j]
        dsub = len(cents[0][1])
        sub = _sub(v, j, dsub)
        assert [cid for cid, _ in cents] == list(range(len(cents)))
        luts.append(F.array(*[_l2sq_lit(sub, c) for _, c in cents]))
    return F.array(*luts)


def pq_adc_expr(codes: Column, luts: Column) -> Column:
    """Asymmetric distance: sum over subspaces of lut[sub][code[sub]],
    as the sequential sub-order fold (matches list_sum over a
    sub_id-ordered list in SQL)."""
    return F.aggregate(
        F.zip_with(codes, luts,
                   lambda code, lut: F.element_at(lut,
                                                  code.cast("int") + 1)),
        F.lit(0.0), lambda acc, v: acc + v)
