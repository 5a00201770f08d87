"""Fellegi-Sunter probabilistic linkage: EM parameter recovery on a
known mixture, bit-packing/posterior parity with an independent Python
computation, and end-to-end discrimination on planted duplicates."""

import numpy as np
from pyspark.sql import functions as F

from edlib_spark.operators.linkage import (agreement_bits, fs_em,
                                           fs_posterior_expr, fs_train,
                                           pattern_counts)


def _posterior_py(pat, lam, m, u):
    """Independent posterior: same left-to-right field-order product."""
    pm, pu = lam, 1.0 - lam
    for i in range(len(m)):
        bit = (pat >> i) & 1
        pm *= m[i] if bit else 1.0 - m[i]
        pu *= u[i] if bit else 1.0 - u[i]
    return pm / (pm + pu)


def _mixture_histogram(lam, m, u, n_pairs):
    """Exact-expectation histogram of the FS mixture (no sampling
    noise, so EM has a clean target)."""
    f = len(m)
    counts = []
    for pat in range(1 << f):
        pm, pu = lam, 1.0 - lam
        for i in range(f):
            bit = (pat >> i) & 1
            pm *= m[i] if bit else 1.0 - m[i]
            pu *= u[i] if bit else 1.0 - u[i]
        n = round(n_pairs * (pm + pu))
        if n:
            counts.append((pat, n))
    return counts


def test_fs_em_recovers_planted_mixture():
    """EM on the exact-expectation histogram of a known mixture must
    recover the planted structure: every discriminative field ends up
    with m > u, the match class is the rare one, and high-agreement
    patterns get posterior > 0.9 while zero-agreement gets < 0.1."""
    true_lam, true_m, true_u = 0.05, [0.95, 0.9, 0.85, 0.97], \
        [0.3, 0.1, 0.2, 0.05]
    counts = _mixture_histogram(true_lam, true_m, true_u, 100_000)
    lam, m, u = fs_em(counts, 4, iters=60)
    assert 0.01 < lam < 0.15, lam
    for i in range(4):
        assert m[i] > u[i], (i, m[i], u[i])
    assert _posterior_py(0b1111, lam, m, u) > 0.9
    assert _posterior_py(0b0000, lam, m, u) < 0.1


def test_fs_em_deterministic_and_clamped():
    """Same histogram -> identical floats; a field that always agrees
    is clamped away from exactly 1."""
    counts = [(0b11, 50), (0b10, 20), (0b00, 9930)]
    a = fs_em(counts, 2, iters=20)
    b = fs_em(counts, 2, iters=20)
    assert a == b
    lam, m, u = a
    for x in (lam, *m, *u):
        assert 0.0 < x < 1.0


def test_agreement_bits_and_posterior_match_python(spark):
    """The Spark pattern packing and literal-inlined posterior must
    equal the independent Python computation on every one of the 16
    patterns (bit-exact before rounding — same IEEE product order)."""
    lam, m, u = 0.07, [0.9, 0.8, 0.7, 0.95], [0.4, 0.2, 0.1, 0.02]
    rows = [(pat, bool(pat & 1), bool(pat & 2), bool(pat & 4),
             bool(pat & 8)) for pat in range(16)]
    df = spark.createDataFrame(
        rows, "pat bigint, f0 boolean, f1 boolean, f2 boolean, "
              "f3 boolean")
    flags = [F.col(f"f{i}") for i in range(4)]
    got = {r["pat"]: (r["packed"], r["post"]) for r in
           df.select("pat",
                     agreement_bits(flags).alias("packed"),
                     fs_posterior_expr(flags, lam, m, u).alias("post"))
           .collect()}
    for pat in range(16):
        packed, post = got[pat]
        assert packed == pat
        assert post == _posterior_py(pat, lam, m, u), pat


def test_fs_train_end_to_end_discriminates(spark):
    """Planted two-class pair population -> fs_train learns params
    that separate it: full-agreement pairs score > 0.9, full-
    disagreement < 0.1, and the pattern histogram collected by
    pattern_counts matches the input construction."""
    rng = np.random.default_rng(3)
    rows = []
    # 200 "match" pairs: agree on everything, occasionally drop f1
    for i in range(200):
        f1 = bool(rng.random() < 0.9)
        rows.append((True, f1, True, True))
    # 4800 "non-match" pairs: mostly disagree, f0 agrees by chance
    for i in range(4800):
        f0 = bool(rng.random() < 0.3)
        f2 = bool(rng.random() < 0.15)
        rows.append((f0, False, f2, False))
    df = spark.createDataFrame(
        rows, "f0 boolean, f1 boolean, f2 boolean, f3 boolean")
    flags = [F.col(f"f{i}") for i in range(4)]
    pairs = df.select("*", agreement_bits(flags).alias("pattern"))

    counts = pattern_counts(pairs)
    assert sum(n for _, n in counts) == 5000
    assert all(0 <= p < 16 for p, _ in counts)

    prm = {int(r["field_id"]): r for r in
           fs_train(pairs, 4, iters=40).collect()}
    lam = prm[0]["lam"]
    m = [prm[i]["m"] for i in range(4)]
    u = [prm[i]["u"] for i in range(4)]
    assert abs(lam - 0.04) < 0.02, lam  # 200 / 5000
    # f3 is the perfect discriminator; f0 is weak on purpose
    assert m[3] > 0.99 and u[3] < 0.01
    assert _posterior_py(0b1111, lam, m, u) > 0.9
    assert _posterior_py(0b0000, lam, m, u) < 0.1


def test_fs_tf_posterior_rare_value_is_stronger_evidence(spark):
    """Term-frequency adjustment: with identical agreement patterns,
    agreeing on a RARE categorical value must yield a strictly higher
    posterior than agreeing on a dominant one, and the tf=None fields
    must leave the expression identical to the global-u posterior."""
    lam, m, u = 0.05, [0.9, 0.8, 0.7, 0.95], [0.4, 0.2, 0.1, 0.02]
    rows = [(1, True, 0.01), (2, True, 0.90), (3, False, 0.50)]
    df = spark.createDataFrame(rows, "rid bigint, f0 boolean, tf double")
    flags = [F.col("f0"), F.lit(True), F.lit(False), F.lit(True)]
    post_tf = fs_posterior_expr(flags, lam, m, u,
                                tf=[F.col("tf"), None, None, None])
    post_plain = fs_posterior_expr(flags, lam, m, u)
    got = {r["rid"]: (r["ptf"], r["pp"]) for r in
           df.select("rid", post_tf.alias("ptf"),
                     post_plain.alias("pp")).collect()}
    # rare-value agreement beats common-value agreement beats nothing
    assert got[1][0] > got[2][0]
    # disagreement ignores tf entirely: identical to the plain expr
    assert got[3][0] == got[3][1]
    # independent python check of the rare case (tf replaces u0)
    pm = lam * m[0] * m[1] * (1 - m[2]) * m[3]
    pu = (1 - lam) * 0.01 * u[1] * (1 - u[2]) * u[3]
    assert got[1][0] == pm / (pm + pu)


def test_fs_contract_query_quality(spark):
    """The graded fs_match_documents on the sf0.001 fixture,
    against an FS-feature-independent ground truth (5-gram Jaccard):
    near-dup candidates (jac >= 0.5) classify as matches at >= 0.8
    recall, dissimilar candidates (jac < 0.2) at ZERO false-positive
    rate, and matches are a small minority overall (the EM found a
    rare class, not a degenerate all-match solution)."""
    from edlib_spark.driver_contract import _read, fs_match_documents
    sf = "/root/testdata/sf0.001"
    out = fs_match_documents(spark, sf).collect()
    n = len(out)
    matched = {(r["id_a"], r["id_b"]) for r in out if r["is_match"]}
    assert 0 < len(matched) < 0.05 * n, (len(matched), n)

    docs = {r["doc_id"]: r["text"]
            for r in _read(spark, sf, "documents").collect()}

    def jac(a, b, k=5):
        ga = {a[i:i + k] for i in range(max(len(a) - k + 1, 1))}
        gb = {b[i:i + k] for i in range(max(len(b) - k + 1, 1))}
        return len(ga & gb) / len(ga | gb)

    sims = [(jac(docs[r["id_a"]], docs[r["id_b"]]),
             (r["id_a"], r["id_b"]) in matched) for r in out]
    hi = [s for s in sims if s[0] >= 0.5]
    lo = [s for s in sims if s[0] < 0.2]
    assert len(hi) > 10 and len(lo) > 100, (len(hi), len(lo))
    assert sum(1 for _, hit in hi if hit) >= 0.8 * len(hi)
    assert not any(hit for _, hit in lo)


def test_fs_decision_table_semantics():
    """The optimal decision rule on a hand-checkable 2-field model:
    patterns order by likelihood ratio, the link region's accumulated
    u-mass respects mu, the non-link region's m-mass respects lam_err,
    and decisions are monotone non-increasing along the ratio order."""
    from edlib_spark.operators.linkage import fs_decision_table
    m, u = [0.9, 0.8], [0.1, 0.2]
    # pattern probs: mp(3)=.72 up(3)=.02; mp(1)=.18 up(1)=.08;
    # mp(2)=.08 up(2)=.18; mp(0)=.02 up(0)=.72 -> ratio order 3,1,2,0
    table = fs_decision_table(m, u, 2, mu=0.05, lam_err=0.05)
    by_pat = {p: (r, d) for p, r, d in table}
    assert len(table) == 4 and set(by_pat) == {0, 1, 2, 3}
    # link: only pattern 3 (cu=.02<=.05; adding pattern 1 -> .10)
    # non-link: only pattern 0 (cm=.02<=.05; adding pattern 2 -> .10)
    assert by_pat[3][1] == 2 and by_pat[1][1] == 1
    assert by_pat[2][1] == 1 and by_pat[0][1] == 0
    ratios = [by_pat[p][0] for p in (3, 1, 2, 0)]
    assert ratios == sorted(ratios, reverse=True)
    decs = [by_pat[p][1] for p in (3, 1, 2, 0)]
    assert decs == sorted(decs, reverse=True)
    # error bounds actually bound — computed from the table's OWN
    # decisions, not hand-inlined constants: the accumulated u-mass
    # of the LINK region stays <= mu and the m-mass of the NON-LINK
    # region stays <= lam_err
    def mass(pat, probs):
        v = 1.0
        for i, p in enumerate(probs):
            v *= p if (pat >> i) & 1 else 1.0 - p
        return v
    linked = [p for p, _, d in table if d == 2]
    nonlinked = [p for p, _, d in table if d == 0]
    assert linked and nonlinked
    assert sum(mass(p, u) for p in linked) <= 0.05
    assert sum(mass(p, m) for p in nonlinked) <= 0.05
    # widening the bounds widens the regions monotonically
    loose = {p: d for p, _, d in
             fs_decision_table(m, u, 2, mu=0.15, lam_err=0.15)}
    assert loose[1] == 2 and loose[2] == 0  # clerical band absorbed


def test_fs_classify_contract_consistency(spark):
    """fs_classify_documents is coherent with fs_match_documents on
    the sf0.001 fixture.  NOTE the two queries answer different
    decision problems — the 0.5-posterior threshold includes the prior
    lambda (~0.01 here), while the FS rule bounds ERROR RATES over
    likelihood ratios — so a ratio-14 pattern can be LINK by
    error-bound yet sit below 0.5 posterior.  What IS a theorem:
    decisions are monotone in the likelihood ratio (link ratios >=
    clerical ratios >= non-link ratios), posterior-matched pairs are
    never ranked below unmatched ones, and all three classes appear."""
    from edlib_spark.driver_contract import (fs_classify_documents,
                                             fs_match_documents)
    sf = "/root/testdata/sf0.001"
    cls = {(r["id_a"], r["id_b"]): r
           for r in fs_classify_documents(spark, sf).collect()}
    mat = {(r["id_a"], r["id_b"]): r["is_match"]
           for r in fs_match_documents(spark, sf).collect()}
    assert set(cls) == set(mat)
    decs = {r["decision"] for r in cls.values()}
    assert decs == {0, 1, 2}
    by_dec = {d: [r["lr_ratio_r"] for r in cls.values()
                  if r["decision"] == d] for d in (0, 1, 2)}
    # full region separation: every link ratio >= every clerical
    # ratio >= every non-link ratio (min-vs-max on BOTH boundaries —
    # max-vs-max would let a low clerical ratio hide under a high one)
    assert min(by_dec[2]) >= max(by_dec[1])
    assert min(by_dec[1]) >= max(by_dec[0])
    # posterior >= 0.5 implies ratio >= (1-lam)/lam >> any clerical
    # ratio on this fixture: matched pairs never land in NON-LINK
    for k, r in cls.items():
        if mat[k] == 1:
            assert r["decision"] != 0, k
    # same pattern -> same decision and same ratio everywhere
    seen = {}
    for r in cls.values():
        prev = seen.setdefault(r["pattern"],
                               (r["decision"], r["lr_ratio_r"]))
        assert prev == (r["decision"], r["lr_ratio_r"])


def test_multi_blocking_provenance(spark):
    """multi_blocking_pairs provenance on sf0.001: masks are valid
    bit-unions, n_rules is the popcount, each single rule's pair set
    is exactly the mask-bit slice, and no rule subsumes the union
    (every rule contributes pairs the others miss — the reason
    multi-pass blocking exists)."""
    from edlib_spark.driver_contract import (_SNM_WINDOW, _read,
                                             multi_blocking_pairs,
                                             snm_pairs_documents)
    sf = "/root/testdata/sf0.001"
    rows = multi_blocking_pairs(spark, sf).collect()
    assert rows
    for r in rows:
        assert 1 <= r["rules_mask"] <= 7
        assert r["n_rules"] == bin(r["rules_mask"]).count("1")
        assert r["id_a"] < r["id_b"]
    # snm_pairs_documents orders by rank; normalize to (min, max)
    snm = {(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
           for r in snm_pairs_documents(spark, sf).collect()}
    got_snm = {(r["id_a"], r["id_b"]) for r in rows if r["rules_mask"] & 1}
    assert got_snm == snm
    # every rule contributes uniquely somewhere
    only = {bit: sum(1 for r in rows if r["rules_mask"] == bit)
            for bit in (1, 2, 4)}
    assert all(v > 0 for v in only.values()), only


def test_fs_waterfall_coherence(spark):
    """The odds-space waterfall is the same model as the posterior:
    odds/(1+odds) ~ fs_match's posterior (different IEEE evaluation
    orders, so compare to 1e-6), reconstructing odds from the prior
    and the per-field factors lands within rounding noise, and each
    field's factor takes exactly two values (agree/disagree)."""
    from edlib_spark.driver_contract import (fs_match_documents,
                                             fs_waterfall_documents)
    sf = "/root/testdata/sf0.001"
    wf = {(r["id_a"], r["id_b"]): r
          for r in fs_waterfall_documents(spark, sf).collect()}
    post = {(r["id_a"], r["id_b"]): r["posterior_r"]
            for r in fs_match_documents(spark, sf).collect()}
    assert set(wf) == set(post)
    prior_candidates = set()
    for k, r in wf.items():
        odds = r["odds_r"]
        assert abs(odds / (1.0 + odds) - post[k]) <= 1e-6, k
        prod = r["bf0_r"] * r["bf1_r"] * r["bf2_r"] * r["bf3_r"]
        if prod > 0:
            prior_candidates.add(round(odds / prod, 4))
    # one shared prior across all pairs (rounding tolerance)
    assert len(prior_candidates) <= 3, prior_candidates
    for i in range(4):
        vals = {r[f"bf{i}_r"] for r in wf.values()}
        assert 1 <= len(vals) <= 2, (i, vals)


def test_fs_review_queue_semantics(spark):
    """The review queue must be exactly the uncertainty-sampled head
    of fs_classify's clerical band: every queued pair carries
    decision=1, queue_pos is a contiguous 1..N ramp in non-decreasing
    ambiguity order with deterministic (id_a, id_b) tie-breaks, the
    ambiguity column is |posterior - 0.5|, and the queue truncates at
    _FS_QUEUE_N exactly when the band is deeper than the queue."""
    from edlib_spark.driver_contract import (_FS_QUEUE_N,
                                             fs_classify_documents,
                                             fs_review_queue_documents)
    sf = "/root/testdata/sf0.001"
    q = (fs_review_queue_documents(spark, sf)
         .orderBy("queue_pos").collect())
    cls = {(r["id_a"], r["id_b"]): r["decision"]
           for r in fs_classify_documents(spark, sf).collect()}
    band = sum(1 for d in cls.values() if d == 1)
    assert len(q) == min(_FS_QUEUE_N, band)
    assert [r["queue_pos"] for r in q] == list(range(1, len(q) + 1))
    for r in q:
        assert cls[(r["id_a"], r["id_b"])] == 1, r
        assert abs(abs(r["posterior_r"] - 0.5) - r["ambiguity_r"]) \
            <= 2e-6, r
    keys = [(r["ambiguity_r"], r["id_a"], r["id_b"]) for r in q]
    assert keys == sorted(keys)


def test_meta_blocking_wnp_semantics(spark):
    """Meta-blocking WNP on sf0.001: the retention law re-derived
    independently in Python over the full blocking graph (kept set,
    weights, and retained_by bitmasks all equal), pruning actually
    drops a weak tail, and no node is isolated (each keeps at least
    its max-weight edge, which is >= its own mean by definition)."""
    from edlib_spark.driver_contract import (meta_blocking_pairs,
                                             multi_blocking_pairs)
    sf = "/root/testdata/sf0.001"
    full = [(r["id_a"], r["id_b"], r["n_rules"])
            for r in multi_blocking_pairs(spark, sf).collect()]
    deg, sw = {}, {}
    for a, b, w in full:
        for n in (a, b):
            deg[n] = deg.get(n, 0) + 1
            sw[n] = sw.get(n, 0) + w
    expect = {}
    for a, b, w in full:
        mask = ((1 if w * deg[a] >= sw[a] else 0)
                | (2 if w * deg[b] >= sw[b] else 0))
        if mask:
            expect[(a, b)] = (w, mask)
    got = {(r["id_a"], r["id_b"]): (r["weight"], r["retained_by"])
           for r in meta_blocking_pairs(spark, sf).collect()}
    assert got == expect
    assert 0 < len(got) < len(full)
    # WNP never isolates a record: every node of the blocking graph
    # still appears in some surviving edge
    assert {n for ab in got for n in ab} == set(deg)


def test_meta_blocking_quality_semantics(spark):
    """The WNP quality audit on sf0.001: counts re-derived from the
    graded edge queries plus an independent Jaccard truth computation
    (exact 5-gram sets in Python over the candidate pairs), the
    emit_all=True operator surface equals the filtered one on the kept
    slice, and — the number the audit exists for — pruning keeps every
    Jaccard>=0.8 truth pair while dropping a real fraction of the
    candidate set."""
    from edlib_spark.driver_contract import (_read, meta_blocking_pairs,
                                             meta_blocking_quality,
                                             multi_blocking_pairs)
    from edlib_spark.operators.blocking import weighted_node_prune
    sf = "/root/testdata/sf0.001"
    full = multi_blocking_pairs(spark, sf)
    kept = {(r["id_a"], r["id_b"]): (r["weight"], r["retained_by"])
            for r in meta_blocking_pairs(spark, sf).collect()}
    flagged = {(r["id_a"], r["id_b"]): (r["weight"], r["retained_by"])
               for r in weighted_node_prune(
                   full, weight_col="n_rules", emit_all=True).collect()}
    assert {k: v for k, v in flagged.items() if v[1] > 0} == kept

    texts = {r["doc_id"]: r["text"]
             for r in _read(spark, sf, "documents").collect()}

    def g5(t):
        return ({t[i:i + 5] for i in range(len(t) - 4)}
                if len(t) >= 5 else {t})

    n_truth = n_truth_kept = 0
    for (a, b), (_, mask) in flagged.items():
        sa, sb = g5(texts[a]), g5(texts[b])
        if 100 * len(sa & sb) >= 80 * len(sa | sb):
            n_truth += 1
            n_truth_kept += mask > 0
    row = meta_blocking_quality(spark, sf).collect()[0]
    assert row["n_candidates"] == len(flagged)
    assert row["n_kept"] == len(kept)
    assert row["n_truth"] == n_truth
    assert row["n_truth_kept"] == n_truth_kept
    assert row["kept_fraction"] == len(kept) / len(flagged)
    assert 0 < row["kept_fraction"] < 1
    assert n_truth > 0 and row["truth_retention"] == 1.0


def test_wnp_randomized_equivalence(spark):
    """weighted_node_prune against a pure-Python re-derivation on
    seeded random graphs — boundary ties (w*deg == sw exactly),
    uniform-weight graphs (everything kept, both endpoints vote),
    hubs, degree-1 nodes — plus emit_all=False equals the kept slice
    of emit_all=True, and the never-isolates invariant."""
    import random
    from edlib_spark.operators.blocking import weighted_node_prune
    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(5, 40)
        pairs = {tuple(sorted(rng.sample(range(n), 2)))
                 for _ in range(rng.randint(n, 4 * n))}
        uniform = seed % 3 == 0
        rows = [(a, b, 1 if uniform else rng.randint(1, 4))
                for a, b in sorted(pairs)]
        df = spark.createDataFrame(rows, "id_a long, id_b long, w long")
        got = {(r["id_a"], r["id_b"]): (r["weight"], r["retained_by"])
               for r in weighted_node_prune(df, "w",
                                            emit_all=True).collect()}
        deg, sw = {}, {}
        for a, b, w in rows:
            for node in (a, b):
                deg[node] = deg.get(node, 0) + 1
                sw[node] = sw.get(node, 0) + w
        expect = {(a, b): (w, (1 if w * deg[a] >= sw[a] else 0)
                           | (2 if w * deg[b] >= sw[b] else 0))
                  for a, b, w in rows}
        assert got == expect, f"seed {seed}"
        kept = {k: v for k, v in got.items() if v[1] > 0}
        got_filtered = {(r["id_a"], r["id_b"]): (r["weight"],
                                                 r["retained_by"])
                        for r in weighted_node_prune(df, "w").collect()}
        assert got_filtered == kept, f"seed {seed}"
        if uniform:
            assert all(v[1] == 3 for v in got.values()), f"seed {seed}"
        # pruning never isolates a node of the input graph
        assert {x for ab in kept for x in ab} == set(deg), f"seed {seed}"


def test_wep_randomized_equivalence(spark):
    """weighted_edge_prune against a pure-Python re-derivation on the
    same seeded random graphs as the WNP test: the global-mean rule
    (w * n_edges >= sum_w), boundary ties included; a uniform-weight
    graph keeps everything (every w equals the mean).  Also documents
    the WEP/WNP contrast: WEP MAY isolate nodes (no assertion that it
    doesn't), which is exactly why the engine grades both."""
    import random

    from edlib_spark.operators.blocking import weighted_edge_prune
    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(5, 40)
        pairs = {tuple(sorted(rng.sample(range(n), 2)))
                 for _ in range(rng.randint(n, 4 * n))}
        uniform = seed % 3 == 0
        rows = [(a, b, 1 if uniform else rng.randint(1, 4))
                for a, b in sorted(pairs)]
        df = spark.createDataFrame(rows, "id_a long, id_b long, w long")
        got = {(r["id_a"], r["id_b"]): r["weight"]
               for r in weighted_edge_prune(df, "w").collect()}
        n_e, sw = len(rows), sum(w for _, _, w in rows)
        expect = {(a, b): w for a, b, w in rows if w * n_e >= sw}
        assert got == expect, f"seed {seed}"
        if uniform:
            assert len(got) == len(rows), f"seed {seed}"


def test_block_size_profile_consistency(spark):
    """The block profiler's pair masses against the blocking union's
    provenance masks on sf0.001: the structural rule's mass equals its
    actual pair count exactly (each pair lives in exactly one (lang,
    band) block), the minhash mass upper-bounds its distinct pair
    count (a pair colliding in several of the 4 bands is mass-counted
    per band but emitted once), and per-rule record mass equals n_docs
    (structural: 1 key/record) and 4*n_docs (minhash: 1 key/band)."""
    from edlib_spark.driver_contract import (_read, block_size_profile,
                                             multi_blocking_pairs)
    sf = "/root/testdata/sf0.001"
    prof = {r["rule"]: r for r in
            (block_size_profile(spark, sf)
             .groupBy("rule")
             .agg(F.sum(F.col("n_blocks") * F.col("block_size"))
                  .alias("rows"),
                  F.sum("n_pairs").alias("mass")).collect())}
    masks = [r["rules_mask"]
             for r in multi_blocking_pairs(spark, sf).collect()]
    n_docs = _read(spark, sf, "documents").count()
    assert prof["structural"]["rows"] == n_docs
    assert prof["minhash"]["rows"] == 4 * n_docs
    assert prof["structural"]["mass"] == sum(1 for m in masks if m & 4)
    n_mh = sum(1 for m in masks if m & 2)
    assert n_mh <= prof["minhash"]["mass"]
