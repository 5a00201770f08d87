"""Text-analysis operators for large-scale training-data pipelines:
language-ID heuristic, SimHash, n-gram Jaccard, rolling-hash
fingerprints, embedding LSH buckets.

Design rule: tokenization/hashing happens JVM-side (split + xxhash64 via
higher-order functions); only bit-twiddling that Catalyst can't express
(SimHash majority vote) drops into a vectorized pandas UDF over the
already-hashed arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

_STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "that", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans",
           "les"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu",
           "den"],
    "zh": ["的", "是", "在", "了", "有", "和", "人", "这", "中", "大"],
}


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def lang_id(text: Column) -> Column:
    """Stopword-hit language heuristic: argmax over per-language stopword
    counts, 'und' (undetermined) when nothing hits.  Pure Catalyst."""
    toks = tokens(text)
    scores = [
        (lang,
         F.size(F.filter(toks, lambda t: t.isin(*words))))  # noqa: B023
        for lang, words in _STOPWORDS.items()
    ]
    best = None
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:
        cond = score > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, score).otherwise(best_score)
        best = (best_lang, best_score)
    return best[0]


def token_hashes(text: Column) -> Column:
    """xxhash64 per token (JVM-side), input to SimHash."""
    return F.transform(tokens(text), lambda t: F.xxhash64(t))


@pandas_udf(LongType())
def _simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """64-bit SimHash majority vote over pre-hashed tokens (vectorized
    numpy bit unpacking; no string work in Python)."""
    out = np.zeros(len(hashes), dtype=np.int64)
    for i, hs in enumerate(hashes):
        if hs is None or len(hs) == 0:
            continue
        a = np.asarray(hs, dtype=np.int64).view(np.uint64)
        bits = ((a[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1))
        votes = bits.sum(axis=0) * 2 > len(a)
        word = np.uint64(0)
        for b in np.nonzero(votes)[0]:
            word |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(word.astype(np.int64))
    return pd.Series(out)


def simhash(text: Column) -> Column:
    return _simhash_from_hashes(token_hashes(text))


def simhash_band_keys(sim: Column, bands: int = 4) -> Column:
    """Split the 64-bit simhash into ``bands`` chunks; docs within
    hamming distance bands-1 share at least one chunk key."""
    width = 64 // bands
    mask = (1 << width) - 1
    return F.array(*[
        F.concat(F.lit(f"sh{i}:"),
                 (F.shiftrightunsigned(sim, i * width)
                  .bitwiseAND(F.lit(mask))).cast("string"))
        for i in range(bands)
    ])


def ngram_set(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (sorted, deterministic)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(
        F.slice(toks, i + 1, n), " "))
    return F.array_sort(F.array_distinct(grams))


def rolling_fingerprint(text: Column, window: int = 16,
                        keep_mod: int = 8) -> Column:
    """Winnowing-style document fingerprint: xxhash64 of each
    ``window``-char shingle, keep hashes = 0 (mod keep_mod), xor-fold.
    Content-defined, so local edits perturb only nearby shingles."""
    length = F.length(text)
    idx = F.sequence(F.lit(1), F.greatest(length - F.lit(window - 1),
                                          F.lit(1)))
    shingles = F.transform(idx, lambda i: F.xxhash64(
        text.substr(i, F.lit(window))))
    kept = F.filter(shingles, lambda h: F.pmod(h, F.lit(keep_mod)) == 0)
    return F.aggregate(kept, F.lit(0).cast("long"),
                       lambda acc, h: acc.bitwiseXOR(h))


def embedding_lsh_key(vec: Column, num_planes: int = 8, dim: int = 64,
                      seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket for a float vector column: sign bits
    of dot products with ``num_planes`` fixed seeded planes, packed into
    one long.  Plane coordinates are Column literals — the whole bucket
    computation stays in Catalyst."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    key = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x)
        key = key + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return key
