"""Benchmark harness.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

It also produces the cluster-size scaling evidence required by the
north rule: the same pairwise-scoring job at local[8] vs local[32]
(N and 4N cores — no real cluster in this sandbox), reporting
scored-pairs/sec at both plus the scaling efficiency, written to
BENCH/BASELINE.md and included in the JSON under "scaling".

Usage: python bench.py [--no-scaling]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# bench-scale pair table (~15k clusters -> a few million candidate
# pairs): big enough that the scoring stage is compute-bound and the
# N-vs-4N scaling measurement is not startup-noise-dominated.
PAIRS_PATH = "/root/repo/data/bench_pairs_bench.parquet"
BENCH_SCALE = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "bench")


def _sf_value(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def ensure_bench_pairs(spark):
    """Deterministic pre-joined candidate-pair table for the scoring
    throughput job (built once, reused across rounds)."""
    from pyspark.sql import functions as F

    from edlib_spark.operators.canonicalize import canonicalize
    from edlib_spark.operators.pairs import candidate_pairs
    from edlib_spark.plans.linkage import LinkageConfig, build_blocks
    from edlib_spark.sources.transcripts import ensure_transcripts_parquet

    if os.path.exists(os.path.join(PAIRS_PATH, "_SUCCESS")):
        return
    tpath = ensure_transcripts_parquet(spark, BENCH_SCALE)
    t = spark.read.parquet(tpath)
    canon = canonicalize(t).cache()
    blocks = build_blocks(canon, LinkageConfig())
    # deterministic 1-in-6 pair sample: ~3M of the ~18M bench-scale
    # candidates — compute-bound for the scaling run yet fast to build
    pairs = candidate_pairs(blocks).where(
        F.pmod(F.xxhash64("id_a", "id_b"), F.lit(6)) == 0)
    a = canon.select(F.col("conv_id").alias("id_a"),
                     F.col("full_text").alias("text_a"),
                     F.col("text_len").alias("len_a"))
    b = canon.select(F.col("conv_id").alias("id_b"),
                     F.col("full_text").alias("text_b"),
                     F.col("text_len").alias("len_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    joined.repartition(128).write.mode("overwrite").parquet(PAIRS_PATH)
    canon.unpersist()


def scoring_job(spark) -> tuple[float, int]:
    """The scaling-evidence job: batched Myers scoring of the prebuilt
    pair table.  Returns (seconds, n_pairs)."""
    from pyspark.sql import functions as F

    from edlib_spark.functions.alignment import edit_distance

    df = spark.read.parquet(PAIRS_PATH)
    max_len = F.greatest("len_a", "len_b")
    k = F.ceil(F.lit(0.2) * max_len).cast("int")
    scored = (df.where(F.abs(F.col("len_a") - F.col("len_b")) <= k)
              .sortWithinPartitions(max_len)
              .select(edit_distance(F.col("text_a"), F.col("text_b"),
                                    "NW", k).alias("d")))
    secs, n = _timed(lambda: scored.where(F.col("d").isNotNull()).count())
    return secs, n


def headline_queries(spark, sf_dir):
    """Per-query wall seconds on the driver sf dir."""
    from edlib_spark import driver_contract as dc

    qs = {}

    secs, _ = _timed(lambda: dc.canonical_conversations(
        spark, sf_dir).count())
    qs["canonicalize_events"] = secs

    secs, _ = _timed(lambda: dc.scored_pairs_events(spark, sf_dir).count())
    qs["scored_pairs_events"] = secs

    secs, _ = _timed(lambda: dc.clusters_events(spark, sf_dir).count())
    qs["clusters_events"] = secs

    secs, _ = _timed(lambda: dc.doc_exact_dedup(spark, sf_dir).count())
    qs["doc_exact_dedup"] = secs

    secs, _ = _timed(lambda: dc.ann_cosine_topk(spark, sf_dir).count())
    qs["ann_cosine_topk"] = secs

    secs, _ = _timed(lambda: dc.minhash_blocks_documents(
        spark, sf_dir).count())
    qs["minhash_blocks_documents"] = secs
    return qs


def run_at(master: str, shuffle_partitions: int):
    from edlib_spark.session import get_spark
    spark = get_spark("edlib-spark-bench", master=master,
                      shuffle_partitions=shuffle_partitions)
    return spark


def main():
    do_scaling = "--no-scaling" not in sys.argv
    sf = _sf_value(SF_DIR)
    results: dict = {"metric": "headline_bench_total", "unit": "sec",
                     "sf": sf, "queries": {}}

    spark = run_at(f"local[{CPUS}]", max(32, CPUS))
    ensure_bench_pairs(spark)

    results["queries"] = headline_queries(spark, SF_DIR)

    secs, n_pairs = scoring_job(spark)
    results["queries"]["pair_scoring_medium"] = secs
    results["scored_pairs"] = n_pairs
    results["scored_pairs_per_sec"] = round(n_pairs / secs, 1)
    spark.stop()

    if do_scaling:
        scaling = {}
        for tag, ncores in (("N=8", 8), ("4N=32", 32)):
            spark = run_at(f"local[{ncores}]", 64)
            # warm: JVM + python workers + parquet footer cache,
            # then best-of-2 timed runs to shed scheduler noise
            scoring_job(spark)
            secs, n = scoring_job(spark)
            secs2, _ = scoring_job(spark)
            secs = min(secs, secs2)
            scaling[tag] = {"cores": ncores, "sec": round(secs, 2),
                            "pairs_per_sec": round(n / secs, 1)}
            spark.stop()
        eff = (scaling["4N=32"]["pairs_per_sec"]
               / (4 * scaling["N=8"]["pairs_per_sec"]))
        scaling["efficiency_N_to_4N"] = round(eff, 3)
        results["scaling"] = scaling
        _write_scaling_md(scaling, results)

    results["value"] = round(sum(results["queries"].values()), 2)
    print(json.dumps(results))


def _write_scaling_md(scaling, results):
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    n8 = scaling["N=8"]
    n32 = scaling["4N=32"]
    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

The north rule's two-cluster-size criterion, evidenced by running the
identical pairwise-scoring job (batched Myers NW, tau=0.2, medium
synthetic transcripts, {results.get('scored_pairs', '?')} candidate
pairs) at two parallelism levels on the same input (no real cluster in
this sandbox):

| config | cores | wall sec | scored pairs/sec |
|---|---|---|---|
| local[8] (N) | 8 | {n8['sec']} | {n8['pairs_per_sec']} |
| local[32] (4N) | 32 | {n32['sec']} | {n32['pairs_per_sec']} |

**Scaling efficiency N -> 4N: {scaling['efficiency_N_to_4N']}**
(target >= 0.8; efficiency = throughput_4N / (4 x throughput_N))

Headline per-query seconds at sf={results['sf']}: see BENCH_r*.json.
"""
    with open("/root/repo/BENCH/BASELINE.md", "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
