"""Tests for text-analysis operators and the FASTA source."""

from pyspark.sql import functions as F

from edlib_spark.operators.textops import (
    embedding_lsh_key, lang_id, ngram_set, rolling_fingerprint, simhash,
    simhash_band_keys, tokens,
)
from edlib_spark.sources.fasta import read_fasta


def test_tokens_and_lang_id(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat and it is that for it",),
         ("el gato que la casa y en un jardin con los arboles",),
         ("xyzzy plugh",)], ["text"])
    got = [r["l"] for r in
           df.select(lang_id(F.col("text")).alias("l")).collect()]
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "und"


def test_ngram_set(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    got = df.select(ngram_set(F.col("text"), 3).alias("g")) \
        .collect()[0]["g"]
    assert got == ["a b c", "b c d"]


def test_simhash_near_duplicates_close(spark):
    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base.replace("lazy", "lzay", 1)
    far = "entirely different words everywhere now always " * 6
    df = spark.createDataFrame([(0, base), (1, near), (2, far)],
                               ["i", "text"])
    got = {r["i"]: r["s"] for r in
           df.select("i", simhash(F.col("text")).alias("s")).collect()}

    def hamming(a, b):
        return bin((a & 0xFFFFFFFFFFFFFFFF) ^ (b & 0xFFFFFFFFFFFFFFFF)) \
            .count("1")

    assert hamming(got[0], got[1]) < hamming(got[0], got[2])
    # near-dups share at least one band key
    keys = {r["i"]: set(r["k"]) for r in
            df.select("i", simhash_band_keys(
                simhash(F.col("text"))).alias("k")).collect()}
    assert keys[0] & keys[1]


def test_rolling_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [("some reasonably long document text for fingerprinting here",)],
        ["text"])
    a = df.select(rolling_fingerprint(F.col("text")).alias("f")) \
        .collect()[0]["f"]
    b = df.select(rolling_fingerprint(F.col("text")).alias("f")) \
        .collect()[0]["f"]
    assert a == b


def test_embedding_lsh_same_vector_same_bucket(spark):
    vec = [0.1] * 64
    df = spark.createDataFrame([(0, vec), (1, vec),
                                (2, [-0.1] * 64)], ["i", "v"])
    got = {r["i"]: r["b"] for r in
           df.select("i", embedding_lsh_key(F.col("v")).alias("b"))
           .collect()}
    assert got[0] == got[1]
    assert got[0] != got[2]


def test_read_fasta(spark, tmp_path):
    p = tmp_path / "seqs.fasta"
    p.write_text(">seq one\nACGT\nACGT\n>seq two\n\nTTTT\n>empty\n")
    got = {r["header"]: r["sequence"]
           for r in read_fasta(spark, str(p)).collect()}
    assert got == {"seq one": "ACGTACGT", "seq two": "TTTT", "empty": ""}
    idx = {r["header"]: r["seq_idx"]
           for r in read_fasta(spark, str(p)).collect()}
    assert idx == {"seq one": 0, "seq two": 1, "empty": 2}


def test_transcripts_jsonl_roundtrip(spark, tmp_path):
    from edlib_spark.sources.transcripts import (read_transcripts_jsonl,
                                                 synth_transcripts,
                                                 write_transcripts_jsonl)
    orig = synth_transcripts(spark, n_clusters=5, seed=42)
    path = str(tmp_path / "t.jsonl")
    write_transcripts_jsonl(orig, path)
    back = read_transcripts_jsonl(spark, path)
    a = {tuple(r) for r in orig.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b

    # malformed rows (missing conv_id / turn_idx) are dropped
    extra = tmp_path / "t.jsonl" / "part-malformed.json"
    extra.write_text('{"role":"user","text":"no ids"}\n'
                     '{"conv_id":"x","turn_idx":0,"role":"user",'
                     '"text":"ok","tool":null,'
                     '"ts":"2024-01-01T00:00:00"}\n')
    again = read_transcripts_jsonl(spark, str(tmp_path / "t.jsonl"))
    assert again.count() == orig.count() + 1
