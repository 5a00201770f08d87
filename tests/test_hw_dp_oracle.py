"""The recursive-CTE Levenshtein-DP oracles for the untruncated HW/SHW
queries are themselves logic — pin them without Spark: run the exact
SQL strings the driver executes against a synthetic DuckDB documents
table and compare every value (distance, end-location set size, first
start/end incl. the -1 empty-window edge) with kernel.align on the
identical slices."""

import random
import string

import duckdb
import pytest

from edlib_spark import kernel
from edlib_spark.driver_contract import (_SQL_HW_DOCUMENTS,
                                         _SQL_HW_LOCATIONS_DOCUMENTS,
                                         _SQL_SHW_DOCUMENTS)


def _make_docs():
    """ASCII-only texts engineered to hit every oracle branch: exact
    infix hits (distance 0, multi-location ties), near-dups, unrelated
    text, and a query alphabet disjoint from its target (best == qlen,
    the reference's -1 empty-window end)."""
    rng = random.Random(20240817)
    docs = []
    alpha = "abcde"
    for doc_id in range(1, 61):
        kind = doc_id % 4
        n = rng.randint(30, 380)
        if kind == 0:
            text = "".join(rng.choice(alpha) for _ in range(n))
        elif kind == 1:  # repetitive: many tied best end locations
            text = ("abcab" * 80)[:max(n, 60)]
        elif kind == 2:  # includes chars the sliced query won't have
            text = "".join(rng.choice("xyz") for _ in range(n))
        else:
            text = "".join(rng.choice(string.ascii_lowercase)
                           for _ in range(n))
        docs.append((doc_id, text))
    # adjacent pair where the query slice is an exact substring of the
    # target (distance 0)
    base = "".join(random.Random(7).choice(alpha) for _ in range(200))
    docs.append((61, "x" * 9 + base[:60] + "x" * 40))
    docs.append((62, "qq" + base[:60] + "qq"))
    return docs


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO documents VALUES (?, ?)", _make_docs())
    return c


def test_hw_distance_dp_oracle_matches_kernel(con):
    got = {r[0]: r for r in con.sql(_SQL_HW_DOCUMENTS).fetchall()}
    docs = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
    checked = 0
    for id_a, text in docs.items():
        if id_a + 1 not in docs:
            continue
        ta = text[9:49]
        tb = docs[id_a + 1]
        ref = kernel.align(ta, tb, mode="HW",
                           task="distance")["editDistance"]
        assert got[id_a][2] == ref, (id_a, ta, tb)
        checked += 1
    assert checked == len(got) and checked > 50


def test_shw_distance_bounded_oracle_matches_kernel(con):
    got = {r[0]: r for r in con.sql(_SQL_SHW_DOCUMENTS).fetchall()}
    docs = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
    checked = 0
    for id_a, text in docs.items():
        if id_a + 1 not in docs:
            continue
        ref = kernel.align(text[:40], docs[id_a + 1], mode="SHW",
                           task="distance")["editDistance"]
        assert got[id_a][2] == ref, id_a
        checked += 1
    assert checked == len(got) and checked > 50


def test_hw_locations_dp_oracle_matches_kernel(con):
    got = {r[0]: r for r in con.sql(_SQL_HW_LOCATIONS_DOCUMENTS)
           .fetchall()}
    docs = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
    seen_minus_one = seen_ties = 0
    for id_a, text in docs.items():
        if id_a + 1 not in docs or id_a + 1 >= 100:
            continue
        ta = text[19:44]
        tb = docs[id_a + 1][:300]
        ref = kernel.align(ta, tb, mode="HW", task="locations")
        s0, e0 = ref["locations"][0]
        row = got[id_a]
        assert row[2] == ref["editDistance"], id_a
        assert row[3] == len(ref["locations"]), id_a
        assert row[4] == s0 and row[5] == e0, id_a
        if e0 == -1:
            seen_minus_one += 1
        if len(ref["locations"]) > 3:
            seen_ties += 1
    # the fixture must actually exercise the hard branches
    assert seen_minus_one >= 1
    assert seen_ties >= 1
