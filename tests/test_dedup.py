"""Near-duplicate detection family: MinHash+LSH, SimHash, embedding
cosine — verified against brute-force computation on planted near-dups."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from edlib_spark.operators.dedup import (char_ngram_set,
                                         cosine_neardup_pairs,
                                         minhash_neardup_pairs,
                                         simhash_neardup_pairs)


def _jaccard(a: str, b: str, n: int = 5) -> float:
    ga = {a[i:i + n] for i in range(max(len(a) - n + 1, 1))}
    gb = {b[i:i + n] for i in range(max(len(b) - n + 1, 1))}
    return len(ga & gb) / len(ga | gb)


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]
    rows = []
    did = 0
    # 10 planted near-dup pairs (single-word substitution) + noise docs
    for _ in range(10):
        base = " ".join(words[i] for i in rng.integers(0, 15, 40))
        mutated = base.replace(base.split()[5], "mutant", 1)
        rows.append((did, base)); did += 1
        rows.append((did, mutated)); did += 1
    for _ in range(30):
        rows.append((did, " ".join(
            words[i] for i in rng.integers(0, 15, 40)))); did += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_neardup_matches_bruteforce(docs):
    got = {(r.id_a, r.id_b)
           for r in minhash_neardup_pairs(docs, tau_pct=80).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    ids = sorted(texts)
    want = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
            if _jaccard(texts[a], texts[b]) >= 0.8}
    assert want, "fixture must plant near-dup pairs"
    assert got == want


def test_minhash_counts_are_exact(docs):
    rows = minhash_neardup_pairs(docs, tau_pct=80).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in rows:
        ga = {texts[r.id_a][i:i + 5]
              for i in range(max(len(texts[r.id_a]) - 4, 1))}
        gb = {texts[r.id_b][i:i + 5]
              for i in range(max(len(texts[r.id_b]) - 4, 1))}
        assert r.inter_count == len(ga & gb)
        assert r.union_count == len(ga | gb)


def test_char_ngram_set_short_strings(spark):
    df = spark.createDataFrame([("ab",), ("abcdef",)], "text string")
    rows = df.select(char_ngram_set(F.col("text")).alias("g")).collect()
    assert rows[0].g == ["ab"]
    assert rows[1].g == ["abcde", "bcdef"]


def test_simhash_neardup_finds_planted_pairs(docs):
    got = {(r.id_a, r.id_b)
           for r in simhash_neardup_pairs(docs, max_hamming=8).collect()}
    # every planted pair differs by one token -> tiny hamming distance
    planted = {(2 * i, 2 * i + 1) for i in range(10)}
    assert planted <= got
    for a, b in got:
        assert a < b


def test_cosine_neardup_bruteforce(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    # plant 3 near-identical pairs
    for i in range(3):
        vecs[2 * i + 1] = vecs[2 * i] + 0.01 * rng.standard_normal(16)\
            .astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id bigint, embedding array<float>")
    got = {(r.id_a, r.id_b): r.cos_r
           for r in cosine_neardup_pairs(emb, threshold=0.9).collect()}
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    want = {(a, b) for a in range(40) for b in range(a + 1, 40)
            if sims[a, b] >= 0.9}
    assert {(0, 1), (2, 3), (4, 5)} <= want
    assert set(got) == want


def test_cosine_neardup_handles_empty_blocks(spark):
    """Blocked-GEMM task groups where one side's block hashed no
    vectors (n_blocks >> n_vectors) must yield empty frames, not an
    np.stack crash."""
    from edlib_spark.operators.dedup import cosine_neardup_pairs
    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)]) for i in range(5)]
        + [(100, [1.0] + [0.0] * 7)],
        "vec_id long, embedding array<double>")
    got = sorted(tuple(r) for r in
                 cosine_neardup_pairs(emb, threshold=0.9,
                                      n_blocks=16).collect())
    assert got == [(0, 100, 1.0)]


def test_cosine_neardup_duplicate_ids_no_self_pairs(spark):
    """Duplicate vec_ids in the input must not emit (x, x) self-pairs —
    parity with the id_a < id_b theta-join formulation, which could
    never produce one."""
    from edlib_spark.operators.dedup import cosine_neardup_pairs
    emb = spark.createDataFrame(
        [(7, [1.0, 0.0]), (7, [1.0, 0.0]), (9, [0.99, 0.01]),
         (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    got = cosine_neardup_pairs(emb, threshold=0.9, n_blocks=4).collect()
    assert all(r.id_a != r.id_b for r in got)
    assert {(r.id_a, r.id_b) for r in got} == {(7, 9)}
