"""Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter,
JASA 1969) — the classical decision layer of entity resolution, on top
of any blocking stage (key-equality blocks, LSH, sorted-neighborhood).

The reference engine scores candidate pairs with a single alignment
distance (edlib's edit distance; `aligner.cpp` one-vs-N loop).  FS
generalizes that decision: each pair gets a vector of cheap field
*agreements* (language equal?  length band equal?  key prefix equal?),
and the match/non-match likelihoods of every agreement pattern are
LEARNED, unsupervised, by EM over the pattern histogram — the same
formulation modern linkage engines (e.g. Splink's term-frequency-free
core) use.

Scale shape (the reason this decomposition is the right one at 100 TB):

* The ONLY full pass over the pair stream is a groupBy on the packed
  agreement pattern — map-side combine reduces each partition to at
  most 2^f rows (f = number of fields, 16 rows for f=4), so the
  shuffle is O(partitions * 2^f), independent of pair count.
* EM runs on the driver over that tiny histogram: O(2^f * f * iters)
  scalar ops; no iteration touches the cluster.
* Scoring inlines the learned parameters as literals — zero additional
  shuffle or join on the pair stream, and whole-stage codegen keeps
  the posterior arithmetic JVM-side.

Determinism contract (what lets a SQL oracle re-derive the output
exactly): the histogram is collected and sorted by pattern, EM runs a
FIXED number of iterations in pure Python over that sorted list, and
the resulting doubles ride a parquet side table.  The posterior is a
left-to-right product in field order on both sides — IEEE doubles make
that bit-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CLAMP = 1e-6


def agreement_bits(flags: list[Column]) -> Column:
    """Pack boolean agreement Columns into one BIGINT pattern
    (bit i = flags[i]; field order = list order, the same order every
    downstream consumer must use)."""
    expr = F.lit(0).cast("bigint")
    for i, c in enumerate(flags):
        expr = expr + F.when(c, F.lit(1 << i)).otherwise(F.lit(0)) \
            .cast("bigint")
    return expr


def pattern_counts(pairs: DataFrame,
                   pattern_col: str = "pattern") -> list[tuple[int, int]]:
    """Collect the (pattern, count) histogram, sorted by pattern —
    at most 2^f rows reach the driver regardless of pair count."""
    rows = (pairs.groupBy(pattern_col)
            .agg(F.count(F.lit(1)).alias("n")).collect())
    return sorted((int(r[pattern_col]), int(r["n"])) for r in rows)


def fs_em(counts: list[tuple[int, int]], n_fields: int, iters: int = 20,
          lam0: float = 0.1, m0: float = 0.9, u0: float = 0.1):
    """EM for the two-class FS mixture over an agreement-pattern
    histogram.  Pure driver-side Python: deterministic given the sorted
    histogram and the fixed iteration count (no convergence test — a
    data-dependent stopping rule would make the parameter file
    non-reproducible).  Probabilities are clamped away from {0, 1} so
    a field that happens to always (dis)agree cannot produce 0-weight
    posteriors.  Returns (lambda, m[f], u[f])."""
    lam, m, u = lam0, [m0] * n_fields, [u0] * n_fields
    tot = float(sum(n for _, n in counts))
    if tot <= 0:
        raise ValueError(
            "fs_em needs a non-empty pattern histogram — the blocking "
            "stage produced zero candidate pairs")

    def clamp(x: float) -> float:
        return min(max(x, _CLAMP), 1.0 - _CLAMP)

    for _ in range(iters):
        num_lam = 0.0
        m_num = [0.0] * n_fields
        u_num = [0.0] * n_fields
        for pat, n in counts:
            pm, pu = lam, 1.0 - lam
            for i in range(n_fields):
                bit = (pat >> i) & 1
                pm *= m[i] if bit else 1.0 - m[i]
                pu *= u[i] if bit else 1.0 - u[i]
            g = pm / (pm + pu)
            w, wn = n * g, n * (1.0 - g)
            num_lam += w
            for i in range(n_fields):
                if (pat >> i) & 1:
                    m_num[i] += w
                    u_num[i] += wn
        m = [clamp(m_num[i] / num_lam) for i in range(n_fields)]
        u = [clamp(u_num[i] / (tot - num_lam)) for i in range(n_fields)]
        lam = clamp(num_lam / tot)
    return lam, m, u


def fs_train(pairs: DataFrame, n_fields: int, iters: int = 20,
             pattern_col: str = "pattern") -> DataFrame:
    """Histogram -> EM -> parameter DataFrame (field_id BIGINT,
    m DOUBLE, u DOUBLE, lam DOUBLE; lam repeated on every row so the
    whole model rides one side table)."""
    counts = pattern_counts(pairs, pattern_col)
    lam, m, u = fs_em(counts, n_fields, iters)
    spark = pairs.sparkSession
    return spark.createDataFrame(
        [(i, m[i], u[i], lam) for i in range(n_fields)],
        "field_id bigint, m double, u double, lam double")


def fs_posterior_expr(flags: list[Column], lam: float,
                      m: list[float], u: list[float],
                      tf: list[Column | None] | None = None) -> Column:
    """P(match | agreement pattern) with the learned params inlined as
    literals: lam * prod(m_i or 1-m_i) vs (1-lam) * prod(u_i or 1-u_i),
    multiplied LEFT-TO-RIGHT in field order (the order a SQL oracle
    must replicate for bit-exact doubles).

    ``tf``: optional per-field term-frequency Columns (None = keep the
    global u).  When field i AGREES and tf[i] is given, the u-side
    factor is the shared value's corpus frequency instead of the
    EM-averaged u_i — agreement on a rare value is much stronger
    evidence than on a dominant one (the adjustment term-frequency-
    aware linkage engines apply after EM; Winkler 1988's value-specific
    u).  Disagreement keeps the global 1-u_i either way."""
    pm: Column = F.lit(float(lam))
    pu: Column = F.lit(1.0 - float(lam))
    for i, c in enumerate(flags):
        pm = pm * F.when(c, F.lit(float(m[i]))) \
                   .otherwise(F.lit(1.0 - float(m[i])))
        agree_u = (F.lit(float(u[i])) if tf is None or tf[i] is None
                   else tf[i])
        pu = pu * F.when(c, agree_u) \
                   .otherwise(F.lit(1.0 - float(u[i])))
    return pm / (pm + pu)

def fs_decision_table(m: list[float], u: list[float], n_fields: int,
                      mu: float, lam_err: float
                      ) -> list[tuple[int, float, int]]:
    """The Fellegi-Sunter OPTIMAL DECISION RULE (Fellegi & Sunter 1969,
    theorem 1): order the 2^f agreement patterns by descending
    likelihood ratio P(pattern|M)/P(pattern|U); designate LINK (2) from
    the top while the accumulated false-match mass (sum of u-side
    pattern probabilities over linked patterns) stays <= ``mu``, and
    NON-LINK (0) from the bottom while the accumulated false-non-match
    mass (m-side probabilities) stays <= ``lam_err``; everything
    between is POSSIBLE (1) — the clerical-review band whose width the
    two error bounds control.

    Pure driver-side arithmetic over at most 2^f patterns (16 for
    f=4) — O(2^f * f) scalar ops regardless of pair count, the same
    scale shape as the EM step.  Determinism contract: products
    multiply LEFT-TO-RIGHT in field order and the cumulative sums run
    sequentially in (ratio DESC, pattern ASC) order, the exact order a
    SQL oracle's windowed running sums replicate; the decision
    comparisons use the raw doubles (no rounding) — a cross-engine
    last-ulp difference in the running sum could only flip a decision
    if a cumulative mass landed within ~1e-15 of an error bound, which
    the fixed gate fixtures verify does not happen.

    Returns [(pattern, likelihood_ratio, decision)] for every pattern,
    decision in {2 link, 1 possible, 0 non-link}."""
    pats = []
    for pat in range(1 << n_fields):
        mp, up = 1.0, 1.0
        for i in range(n_fields):
            bit = (pat >> i) & 1
            mp *= m[i] if bit else 1.0 - m[i]
            up *= u[i] if bit else 1.0 - u[i]
        pats.append((pat, mp, up))
    order = sorted(pats, key=lambda r: (-(r[1] / r[2]), r[0]))
    cm_from_bottom: dict[int, float] = {}
    cm = 0.0
    for pat, mp, up in reversed(order):
        cm += mp
        cm_from_bottom[pat] = cm
    out = []
    cu = 0.0
    for pat, mp, up in order:
        cu += up
        if cu <= mu:
            dec = 2
        elif cm_from_bottom[pat] <= lam_err:
            dec = 0
        else:
            dec = 1
        out.append((pat, mp / up, dec))
    return out
