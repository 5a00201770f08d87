"""Golden-vector and differential tests for the single-pair kernel.

Golden vectors are copied from the reference's own suites
(/root/reference/bindings/python/test.py and /root/reference/test/runTests.cpp)
so parity is pinned exactly.
"""

import numpy as np
import pytest

from edlib_spark.kernel import (
    align, get_nice_alignment, path_to_cigar,
    OP_MATCH, OP_INSERT, OP_DELETE, OP_MISMATCH,
)
from edlib_spark.oracle import simple_edit_distance, check_alignment


# ---------------------------------------------------------------- goldens

def test_telephone_elephant():  # bindings/python/test.py:6-12
    assert align("telephone", "elephant")["editDistance"] == 3
    assert align(b"telephone", b"elephant")["editDistance"] == 3


def test_additional_equalities():  # bindings/python/test.py:15-17
    r = align("ACTG", "CACTRT", mode="HW", task="path",
              additionalEqualities=[("R", "A"), ("R", "G")])
    assert r["editDistance"] == 0


def test_nice_alignment_all_modes():  # bindings/python/test.py:20-51
    for mode in ("NW", "HW", "SHW"):
        r = align("TAAGGATGGTCCCATTC", "AAGGGGTCTCATATC", mode=mode,
                  task="path")
        nice = get_nice_alignment(r, "TAAGGATGGTCCCATTC", "AAGGGGTCTCATATC")
        assert nice["query_aligned"] == "TAAGGATGGTCCCAT-TC", mode
        assert nice["matched_aligned"] == "-||||--||||.|||-||", mode
        assert nice["target_aligned"] == "-AAGG--GGTCTCATATC", mode


def test_distance_task_has_no_cigar():  # bindings/python/test.py:53-55
    r = align("TAAGGATGGTCCCATTC", "AAGGGGTCTCATATC", mode="NW",
              task="distance")
    assert r["cigar"] is None


def test_empty_sequences():  # bindings/python/test.py:57-69
    assert align("", "elephant")["editDistance"] == 8
    assert align("telephone", "")["editDistance"] == 9
    assert align("", "elephant", mode="HW")["editDistance"] == 0
    assert align("telephone", "", mode="HW")["editDistance"] == 9
    assert align("", "elephant", mode="SHW")["editDistance"] == 0
    assert align("telephone", "", mode="SHW")["editDistance"] == 9
    # end-location semantics (edlib.cpp:165-184)
    assert align("", "elephant")["locations"] == [(None, 7)]
    assert align("", "elephant", mode="HW")["locations"] == [(None, -1)]


def test_unicode():  # bindings/python/test.py:72-73
    r = align("ты милая", "ты гений")
    assert r["editDistance"] == 5
    assert r["alphabetLength"] == 12


def test_long_alphabet():  # bindings/python/test.py:75-80
    alpha = "".join(chr(i) for i in range(1, 257))
    seq1 = alpha * 3
    seq2 = alpha + alpha[::-1] + alpha
    assert align(seq1, seq2)["editDistance"] == 256


def test_alphabet_too_large():  # bindings/python/edlib.pyx:38-41
    alpha = "".join(chr(i) for i in range(1, 258))
    with pytest.raises(ValueError):
        align(alpha, alpha)
    assert align(alpha, alpha, max_alphabet=None)["editDistance"] == 0


def test_cigar_golden():  # test/runTests.cpp:506-533
    moves = [OP_MATCH, OP_MATCH, OP_INSERT, OP_INSERT, OP_INSERT,
             OP_DELETE, OP_INSERT, OP_INSERT, OP_MISMATCH,
             OP_MATCH, OP_MATCH]
    assert path_to_cigar(moves, extended=True) == "2=3I1D2I1X2="
    assert path_to_cigar(moves, extended=False) == "2M3I1D2I3M"


def test_negative_end_location_edge():  # test/runTests.cpp:444-476
    for mode in ("HW", "SHW"):
        r = align("AA", "B", mode=mode, task="path")
        assert r["editDistance"] == 2


def test_overlap_edges():  # test/runTests.cpp:478-504
    assert align("AAABBB", "BBBC", mode="HW",
                 task="locations")["editDistance"] == 3
    assert align("BBBAAA", "CBBB", mode="HW",
                 task="locations")["editDistance"] == 3


def test_degenerate_nucleotide_equalities():  # test/runTests.cpp:535-553
    r = align("GTGNRTCARCGAANCTTTN",
              "ACCGTGAGTCATCGAATCTTTGAACGATGCGTGAAACCTGA",
              mode="HW", task="path",
              additionalEqualities=[("R", "A"), ("R", "G"), ("N", "A"),
                                    ("N", "C"), ("N", "T"), ("N", "G")])
    assert r["editDistance"] == 1


def test_word_boundary_64():  # test/runTests.cpp:317-327 (test5 shape)
    q = "A" * 64
    t = "A" * 64
    r = align(q, t, task="path")
    assert r["editDistance"] == 0
    assert r["cigar"] == "64="


def test_all_mismatch_200():
    q = "A" * 200
    t = "B" * 200
    assert align(q, t)["editDistance"] == 200


def test_iterables_of_hashables():  # edlib.pyx:22-53 (_map_to_bytes)
    assert align([1, 2, 3], [1, 9, 3])["editDistance"] == 1
    assert align(("a", "bb", "c"), ("a", "c"))["editDistance"] == 1


def test_k_bound_contract():  # test/runTests.cpp:167-193
    d = align("telephone", "elephant")["editDistance"]
    for k in (d - 1, d, d + 1):
        r = align("telephone", "elephant", k=k)
        if d > k:
            assert r["editDistance"] == -1
            assert r["locations"] == []
        else:
            assert r["editDistance"] == d


# ------------------------------------------------------------ differential

MODES = ("NW", "SHW", "HW")


def _random_pair(rng, alpha=10, qmin=30, qmax=200, tmin=100, tmax=1200):
    qlen = int(rng.integers(qmin, qmax))
    tlen = int(rng.integers(tmin, tmax))
    q = rng.integers(0, alpha, qlen).astype(np.int64)
    t = rng.integers(0, alpha, tlen).astype(np.int64)
    return q.tolist(), t.tolist()


@pytest.mark.parametrize("mode", MODES)
def test_differential_distance_and_locations(mode):
    """Random differential vs the naive DP oracle: score + full end
    location set (mirrors test/runTests.cpp:33-77 with seed 42)."""
    rng = np.random.default_rng(42)
    for _ in range(40):
        q, t = _random_pair(rng)
        exp_score, exp_pos = simple_edit_distance(q, t, mode)
        r = align(q, t, mode=mode, task="locations")
        assert r["editDistance"] == exp_score
        got_ends = [loc[1] for loc in r["locations"]]
        if mode == "NW":
            assert got_ends == [len(t) - 1]
        else:
            assert got_ends == exp_pos, (mode, exp_score)


@pytest.mark.parametrize("mode", MODES)
def test_differential_k_sweep(mode):
    """k in {d-1, d, d+1}: -1 iff d > k (test/runTests.cpp:167-193)."""
    rng = np.random.default_rng(7)
    for _ in range(15):
        q, t = _random_pair(rng, qmax=120, tmax=500)
        d, _ = simple_edit_distance(q, t, mode)
        for k in (d - 1, d, d + 1):
            r = align(q, t, mode=mode, k=k)
            if d > k:
                assert r["editDistance"] == -1
            else:
                assert r["editDistance"] == d


@pytest.mark.parametrize("mode", MODES)
def test_differential_paths_valid(mode):
    """Paths replay truthfully against both strings and reproduce the
    score (mirrors checkAlignment, test/runTests.cpp:592-641)."""
    rng = np.random.default_rng(1234)
    for _ in range(25):
        q, t = _random_pair(rng, qmax=150, tmax=700)
        r = align(q, t, mode=mode, task="path")
        d = r["editDistance"]
        start, end = r["locations"][0]
        path = _cigar_to_moves(r["cigar"])
        score = check_alignment(q, t, path, start, mode)
        assert score == d
        # path must consume target exactly from start to end
        consumed = sum(1 for m in path if m in (OP_MATCH, OP_MISMATCH,
                                                OP_DELETE))
        assert start + consumed - 1 == end


def test_hirschberg_long_path():
    """Force the Hirschberg branch (>1MB traceback memory) and validate."""
    rng = np.random.default_rng(5)
    base = rng.integers(0, 4, 30000).astype(np.int64)
    q = base.tolist()
    t = base.copy()
    mut = rng.integers(0, len(t), 300)
    t[mut] = (t[mut] + 1) % 4
    t = t.tolist()
    r = align(q, t, mode="NW", task="path")
    path = _cigar_to_moves(r["cigar"])
    score = check_alignment(q, t, path, 0, "NW")
    assert score == r["editDistance"]
    d, _ = simple_edit_distance(q, t, "NW")
    assert r["editDistance"] == d


def test_path_single_target_char_above_mem_limit():
    """tlen == 1 with qlen large enough that the naive mem estimate
    crosses _TRACEBACK_MEM_LIMIT must use the direct traceback, never
    _hirschberg: its left half would be empty and target_stop = -1
    means "full save / no stop" to the scans, not the virtual initial
    column the crossing search expects (the native lane searched the
    wrong column; the Python lane raised).  The single-column saved
    band is O(nblocks) memory, so direct is always safe here."""
    from edlib_spark.kernel import _TRACEBACK_MEM_LIMIT, _ceil_div, WORD
    qlen = 3_400_000
    nblocks = _ceil_div(qlen, WORD)
    assert (2 * 8 + 4) * nblocks * 1 + 2 * 4 >= _TRACEBACK_MEM_LIMIT
    rng = np.random.default_rng(11)
    q = rng.integers(1, 5, qlen).astype(np.int64)
    q[qlen // 2] = 0  # exactly one match available
    q = q.tolist()
    r = align(q, [0], mode="NW", task="path")
    assert r["editDistance"] == qlen - 1
    path = _cigar_to_moves(r["cigar"])
    assert check_alignment(q, [0], path, 0, "NW") == qlen - 1


def _cigar_to_moves(cigar):
    import re
    table = {"=": OP_MATCH, "I": OP_INSERT, "D": OP_DELETE, "X": OP_MISMATCH}
    moves = []
    for num, op in re.findall(r"(\d+)(\D)", cigar):
        moves.extend([table[op]] * int(num))
    return moves


def test_shw_empty_prefix_tie_at_block_boundary():
    """qlen % 64 == 0 corner (ADVICE r1): the reference reports the -1
    empty-prefix end only when the last block has padding cells (its -1
    comes from the c - W readout); at W == 0 no -1 appears.  Kernel and
    DP oracle must agree on both sides of the boundary."""
    from edlib_spark.oracle import simple_edit_distance
    for n, want in ((63, [-1, 0]), (64, [0]), (65, [-1, 0]), (128, [0])):
        q = "a" * n
        got = [e for _, e in
               align(q, "b", mode="SHW", task="locations")["locations"]]
        assert got == want, (n, got)
        dist, ends = simple_edit_distance(q, "b", "SHW")
        assert (dist, ends) == (n, want), (n, dist, ends)


def test_band_at_exact_distance_invariance():
    """align(k=d) must equal align(k=-1) bit-for-bit for every mode and
    task when d is the true distance — the invariant the vectorized
    align_expr leans on (batch distance first, then a per-pair scan
    banded at the already-known distance for locations/path rows).
    Banding discards only cells with score > k, and k = d keeps every
    cell on an optimal path, so distances, full end-location sets,
    start locations, and CIGARs are all unchanged."""
    rng = np.random.default_rng(20240517)
    letters = "abcd"
    for trial in range(120):
        qlen = int(rng.integers(1, 90))
        tlen = int(rng.integers(1, 140))
        q = "".join(letters[i] for i in rng.integers(0, 4, qlen))
        t = "".join(letters[i] for i in rng.integers(0, 4, tlen))
        for mode in ("NW", "HW", "SHW"):
            for task in ("distance", "locations", "path"):
                free = align(q, t, mode=mode, task=task, k=-1)
                banded = align(q, t, mode=mode, task=task,
                               k=free["editDistance"])
                assert banded == free, (trial, mode, task, q, t)


def test_standard_cigar_format_kwarg():
    """cigar_format='standard' through align(): same path as extended,
    =/X collapsed to M (reference CLI -f CIG_STD,
    apps/aligner/aligner.cpp:200-221)."""
    import re
    r_ext = align("telephone", "elephant", task="path")
    r_std = align("telephone", "elephant", task="path",
                  cigar_format="standard")
    assert set(re.sub(r"\d", "", r_std["cigar"])) <= {"M", "I", "D"}
    # independent collapse of the extended string must agree
    moves = _cigar_to_moves(r_ext["cigar"])
    assert r_std["cigar"] == path_to_cigar(moves, extended=False)
    assert r_std["editDistance"] == r_ext["editDistance"]
    with pytest.raises(ValueError):
        align("a", "a", task="path", cigar_format="CIG_STD")
