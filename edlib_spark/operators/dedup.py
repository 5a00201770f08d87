"""Near-duplicate detection over document corpora — the dedup family a
training-data pipeline needs at 100 TB:

* exact dedup          -> hash groupBy (driver_contract.doc_exact_dedup)
* MinHash + LSH        -> ``minhash_neardup_pairs``: LSH band-bucket
                          join proposes candidates, exact char-n-gram
                          Jaccard verifies (no false positives; miss
                          probability (1-j^r)^b, ~2e-4 at j=0.9 with
                          8 bands x 4 rows)
* SimHash              -> ``simhash_neardup_pairs``: band-key join +
                          Hamming-distance verify (F.bit_count, JVM)
* embedding cosine     -> ``cosine_neardup_pairs``: exact threshold
                          join (brute force at test scale; the LSH
                          bucket variant in textops.embedding_lsh_key
                          is the 100 TB candidate-gen path)

All candidate generation is equi-join on block keys (shuffle on the
bucket key, salted upstream via operators.pairs.candidate_pairs), and
all verification math is JVM-side Catalyst expressions — no Python in
any of these paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .blocking import char_ngrams, minhash_blocks
from .pairs import candidate_pairs
from .textops import simhash, simhash_band_keys


def char_ngram_set(text: Column, n: int = 5) -> Column:
    """Distinct, sorted character n-grams (JVM-side)."""
    return F.array_sort(F.array_distinct(char_ngrams(text, n)))


def minhash_neardup_pairs(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", num_hashes: int = 32,
                          bands: int = 8, ngram: int = 5,
                          tau_pct: int = 80) -> DataFrame:
    """(id_a, id_b, inter_count, union_count) for pairs whose exact
    char-``ngram`` Jaccard >= tau_pct/100, candidates proposed by
    MinHash LSH (``bands`` bands of num_hashes/bands rows).

    Integer inter/union counts (not a float Jaccard) keep the result
    exactly comparable across engines."""
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    # a small input may arrive as one parquet split; the per-doc gram
    # hashing is the expensive part, so spread it before computing
    docs = docs.repartition(par, id_col)
    canon = docs.select(F.col(id_col).cast("string").alias("conv_id"),
                        F.col(text_col).alias("full_text"))
    blocks = minhash_blocks(canon, num_hashes=num_hashes, bands=bands,
                            ngram=ngram)
    pairs = candidate_pairs(blocks)

    grams = docs.select(F.col(id_col).cast("string").alias("conv_id"),
                        char_ngram_set(F.col(text_col), ngram).alias("g"))
    a = grams.select(F.col("conv_id").alias("id_a"), F.col("g").alias("ga"))
    b = grams.select(F.col("conv_id").alias("id_b"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    scored = (pairs.join(a, "id_a").join(b, "id_b")
              .select(F.col("id_a").cast("bigint").alias("ia"),
                      F.col("id_b").cast("bigint").alias("ib"),
                      inter.cast("bigint").alias("inter_count"),
                      union.cast("bigint").alias("union_count")))
    # candidate_pairs ordered the STRING ids; renormalize numerically
    return (scored
            .select(F.least("ia", "ib").alias("id_a"),
                    F.greatest("ia", "ib").alias("id_b"),
                    "inter_count", "union_count")
            .where(F.col("inter_count") * 100
                   >= F.lit(tau_pct) * F.col("union_count")))


def simhash_neardup_pairs(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", bands: int = 4,
                          max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) for pairs within ``max_hamming`` bits on
    the 64-bit token SimHash; candidates share at least one of ``bands``
    band keys (guaranteed complete for hamming <= bands-1)."""
    sh = docs.select(F.col(id_col).cast("bigint").alias("doc_id"),
                     simhash(F.col(text_col)).alias("sh"))
    keyed = sh.select("doc_id", "sh",
                      F.explode(simhash_band_keys(F.col("sh"), bands))
                       .alias("band_key"))
    a = keyed.select(F.col("band_key"), F.col("doc_id").alias("id_a"),
                     F.col("sh").alias("sh_a"))
    b = keyed.select(F.col("band_key"), F.col("doc_id").alias("id_b"),
                     F.col("sh").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (a.join(b, "band_key")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", hamming.cast("bigint").alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .dropDuplicates(["id_a", "id_b"]))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns in double
    precision, entirely in Catalyst higher-order functions."""
    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v)
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_neardup_pairs(emb: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         threshold: float = 0.45) -> DataFrame:
    """(id_a, id_b, cos_r) for embedding pairs with cosine >=
    ``threshold`` (rounded to 4 dp for stable cross-engine hashing).

    Exact all-pairs at test scale; at 100 TB candidates come from
    textops.embedding_lsh_key bucket equi-joins instead of the cross
    join (see driver_contract.ann_lsh_topk for the bucketed path)."""
    base = emb.select(F.col(id_col).cast("bigint").alias("vid"),
                      F.col(vec_col).alias("v"))
    a = base.select(F.col("vid").alias("id_a"), F.col("v").alias("va"))
    b = base.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    cos = cosine(F.col("va"), F.col("vb"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cos.alias("cos"))
            .where(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 4).alias("cos_r")))
