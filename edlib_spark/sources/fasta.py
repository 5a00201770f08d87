"""FASTA source connector.

The reference CLI reads multi-sequence FASTA files (header lines '>',
sequence lines concatenated, whitespace stripped — reference
apps/aligner/aligner.cpp:285-328 readFastaSequences).  Spark-first
equivalent: read lines with file+offset lineage, assign each line to the
most recent preceding header (running count of headers = sequence
index), then group-concatenate.  All operations are DataFrame-native
(window over a monotonic in-file line index); one shuffle per file.

Output: (file string, seq_idx long, header string, sequence string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    lines = (spark.read.text(path)
             .withColumn("file", F.input_file_name())
             .withColumn("pos", F.monotonically_increasing_id()))
    w = Window.partitionBy("file").orderBy("pos")
    tagged = (lines
              .withColumn("line", F.trim(F.col("value")))
              .where(F.length("line") > 0)
              .withColumn("is_header",
                          F.col("line").startswith(">").cast("int"))
              .withColumn("seq_idx",
                          F.sum("is_header").over(w) - 1))
    seqs = (tagged.where(~F.col("line").startswith(">"))
            .groupBy("file", "seq_idx")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"]), "").alias("sequence")))
    headers = (tagged.where(F.col("line").startswith(">"))
               .select("file", "seq_idx",
                       F.expr("substring(line, 2)").alias("header")))
    return (headers.join(seqs, ["file", "seq_idx"], "left")
            .select("file", F.col("seq_idx").cast("long").alias("seq_idx"),
                    "header",
                    F.coalesce("sequence", F.lit("")).alias("sequence")))
