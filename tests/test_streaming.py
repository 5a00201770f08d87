"""Streaming scorer: micro-batch results must equal batch results."""

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from edlib_spark.streaming.scorer import run_stream_scoring, score_pair_stream

PAIR_SCHEMA = StructType([
    StructField("id_a", StringType()),
    StructField("id_b", StringType()),
    StructField("text_a", StringType()),
    StructField("text_b", StringType()),
    StructField("len_a", LongType()),
    StructField("len_b", LongType()),
])


def _pairs_df(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        ("a", "b", base, base.replace("quick", "qvick", 1)),
        ("a", "c", base, "completely different text " * 6),
        ("d", "e", base[:100], base[:100]),
    ]
    return spark.createDataFrame(
        [(ia, ib, ta, tb, len(ta), len(tb)) for ia, ib, ta, tb in rows],
        PAIR_SCHEMA)


def test_stream_scoring_equals_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckp = str(tmp_path / "ckp")
    pairs = _pairs_df(spark)
    pairs.write.parquet(inp)

    run_stream_scoring(spark, inp, out, ckp, PAIR_SCHEMA, tau=0.2,
                       available_now=True)
    got = {(r["id_a"], r["id_b"]): r["edit_distance"]
           for r in spark.read.parquet(out).collect()}

    batch = score_pair_stream(pairs, tau=0.2)
    exp = {(r["id_a"], r["id_b"]): r["edit_distance"]
           for r in batch.where((F.col("edit_distance") >= 0)
                                & (F.col("norm_distance") <= 0.2))
           .collect()}
    assert got == exp
    assert ("a", "b") in got and ("d", "e") in got
    assert ("a", "c") not in got


def test_stream_resume_processes_new_files_only(spark, tmp_path):
    """Checkpointed restart: previously-processed input is not rescored."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckp = str(tmp_path / "ckp")
    os.makedirs(inp)
    _pairs_df(spark).write.mode("append").parquet(inp)
    run_stream_scoring(spark, inp, out, ckp, PAIR_SCHEMA,
                       available_now=True)
    n1 = spark.read.parquet(out).count()

    # add one new matching pair; restart from the same checkpoint
    extra = spark.createDataFrame(
        [("x", "y", "hello world again", "hello world again!",
          17, 18)], PAIR_SCHEMA)
    extra.write.mode("append").parquet(inp)
    run_stream_scoring(spark, inp, out, ckp, PAIR_SCHEMA,
                       available_now=True)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1 + 1
