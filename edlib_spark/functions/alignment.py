"""Spark Column functions wrapping the alignment kernels.

Public surface mirrors the reference Python binding
(/root/reference/bindings/python/edlib.pyx:56-155) lifted to columns:

  * ``edit_distance(q, t, mode=..., k=...)`` — the HOT path.  A
    Series->Series pandas UDF over Arrow batches running the
    batch-vectorized Myers kernel (edlib_spark.batch): no per-row Python,
    per-pair k bounds (pass a Column for k).
  * ``align_expr(q, t, mode, task, k, ...)`` — full result struct
    (editDistance, alphabetLength, locations, cigar).  Runs the exact
    single-pair kernel per row inside the Arrow batch; intended for the
    few pairs that survive the match threshold (task='locations'/'path'),
    NOT for bulk scoring.
  * ``norm_distance`` — JVM-side normalized-distance expression.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from ..batch import batch_edit_distance
from .. import kernel

ALIGN_RESULT_TYPE = StructType([
    StructField("editDistance", IntegerType()),
    StructField("alphabetLength", IntegerType()),
    StructField("locations", ArrayType(StructType([
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
    ]))),
    StructField("cigar", StringType()),
])


def edit_distance(query: Column, target: Column, mode: str = "NW",
                  k=-1, additional_equalities=None) -> Column:
    """Edit distance column; -1 where the distance exceeds k.

    ``k`` may be an int (same bound for all rows) or a Column (per-pair
    bound, e.g. ``F.ceil(tau * F.greatest(len_a, len_b))``).
    ``additional_equalities``: optional (a, b) char pairs the aligner
    treats as equal (EdlibEqualityPair, reference edlib.h:92-95) —
    handled inside the batch kernel's Peq profile, so bulk scoring with
    wildcards / case-folding equivalences stays fully vectorized.
    """
    # normalize to hashable pairs for UDF capture; ints (codepoints)
    # pass through unchanged — str() would turn 97 into "97" and crash
    # the kernel's single-char validation downstream
    eqs = ([(a if isinstance(a, int) else str(a),
             b if isinstance(b, int) else str(b))
            for a, b in additional_equalities]
           if additional_equalities else None)

    if isinstance(k, Column):
        @pandas_udf(IntegerType())
        def _dist(q: pd.Series, t: pd.Series, kk: pd.Series) -> pd.Series:
            ks = kk.fillna(-1).astype("int64").to_numpy()
            return pd.Series(
                batch_edit_distance(q.tolist(), t.tolist(), mode, ks,
                                    equalities=eqs))
        return _dist(query, target, k)

    k_val = int(k)

    @pandas_udf(IntegerType())
    def _dist_fixed(q: pd.Series, t: pd.Series) -> pd.Series:
        return pd.Series(
            batch_edit_distance(q.tolist(), t.tolist(), mode, k_val,
                                equalities=eqs))
    return _dist_fixed(query, target)


def align_expr(query: Column, target: Column, mode: str = "NW",
               task: str = "distance", k: int = -1,
               additional_equalities=None, max_alphabet=None) -> Column:
    """Full alignment result struct (slow path: per-row exact kernel).

    ``max_alphabet=None`` (default here, unlike the reference) because
    canonicalized transcripts routinely exceed 256 unique codepoints.
    """
    eqs = list(additional_equalities) if additional_equalities else None

    @pandas_udf(ALIGN_RESULT_TYPE)
    def _align(q: pd.Series, t: pd.Series) -> pd.DataFrame:
        rows = []
        for qs, ts in zip(q, t):
            r = kernel.align(qs or "", ts or "", mode=mode, task=task, k=k,
                             additionalEqualities=eqs,
                             max_alphabet=max_alphabet)
            rows.append((
                r["editDistance"],
                r["alphabetLength"],
                [(s, e) for s, e in r["locations"]],
                r["cigar"],
            ))
        return pd.DataFrame(rows, columns=["editDistance", "alphabetLength",
                                           "locations", "cigar"])
    return _align(query, target)


def nice_alignment(align_result: Column, query: Column,
                   target: Column) -> Column:
    """Debug renderer: query/match/target aligned strings from a cigar
    (reference getNiceAlignment, bindings/python/edlib.pyx:158-238)."""
    out_type = StructType([
        StructField("query_aligned", StringType()),
        StructField("matched_aligned", StringType()),
        StructField("target_aligned", StringType()),
    ])

    @pandas_udf(out_type)
    def _nice(res: pd.DataFrame, q: pd.Series, t: pd.Series) -> pd.DataFrame:
        rows = []
        for (_, r), qs, ts in zip(res.iterrows(), q, t):
            d = {"cigar": r["cigar"],
                 "locations": [(loc["start"], loc["end"])
                               for loc in (r["locations"] or [])]}
            try:
                nice = kernel.get_nice_alignment(d, qs or "", ts or "")
                rows.append((nice["query_aligned"], nice["matched_aligned"],
                             nice["target_aligned"]))
            except (ValueError, TypeError):
                rows.append((None, None, None))
        return pd.DataFrame(rows, columns=["query_aligned",
                                           "matched_aligned",
                                           "target_aligned"])
    return _nice(align_result, query, target)


def norm_distance(dist: Column, len_a: Column, len_b: Column) -> Column:
    """Normalized distance in [0, 1]: dist / max(len_a, len_b); null
    where dist is -1 (exceeded k).  Pure JVM expression."""
    denom = F.greatest(len_a, len_b)
    return F.when(dist >= 0,
                  dist.cast("double") /
                  F.when(denom > 0, denom).otherwise(F.lit(1))
                  .cast("double")).otherwise(F.lit(None))
