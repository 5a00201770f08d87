"""The CIGAR certificate oracle (_sql_cigar_replay) is itself logic —
pin it without Spark: kernel-produced paths must validate and render
identically to get_nice_alignment, and every corruption class (wrong
cost, shifted runs, '=' over a mismatch, trailing garbage, truncated
consumption) must poison the emitted CIGAR so the driver hash breaks."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from edlib_spark import kernel
from edlib_spark.driver_contract import _sql_cigar_replay, _SQL_CIGAR_VALID

PAIRS = [
    ("hello world", "hxllo wrld"),
    ("abcdef", "abQQcdefZZ"),
    ("same", "same"),
    ("kitten", "sitting"),
    ("a" * 80, "b" + "a" * 70),
]


def _run(tmp_path, rows):
    """rows: (id_a, id_b, text_a, text_b, cigar[, lead_ctx]) where
    lead_ctx (default 0) is the count of target chars before the
    aligned window — NW rows are 0; HW-style rows exercise the
    start-preference rule.  Returns oracle rows keyed by id_a."""
    side = tmp_path / "side"
    side.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "id_a": pa.array([r[0] for r in rows], pa.int64()),
        "id_b": pa.array([r[1] for r in rows], pa.int64()),
        "cigar": [r[4] for r in rows],
    }), side / "part-0.parquet")
    con = duckdb.connect()
    con.execute("CREATE TABLE tp(id_a BIGINT, id_b BIGINT,"
                " text_a VARCHAR, text_b VARCHAR, lead_ctx BIGINT)")
    con.executemany("INSERT INTO tp VALUES (?,?,?,?,?)",
                    [r[:4] + (r[5] if len(r) > 5 else 0,) for r in rows])
    sql = _sql_cigar_replay(
        "SELECT id_a, id_b, text_a, text_b, lead_ctx FROM tp",
        str(side), f"""
        SELECT p.id_a,
               CASE WHEN {_SQL_CIGAR_VALID}
                    THEN c.cigar ELSE '!invalid' END AS cigar,
               ch.query_aligned, ch.matched_aligned, ch.target_aligned
        FROM pairs p JOIN pc c USING (id_a, id_b)
        JOIN checked ch USING (id_a, id_b)""")
    return {r[0]: r for r in con.sql(sql).fetchall()}


def test_kernel_paths_certify_and_render(tmp_path):
    rows, expect = [], {}
    for i, (a, b) in enumerate(PAIRS):
        res = kernel.align(a, b, mode="NW", task="path")
        nice = kernel.get_nice_alignment(res, a, b)
        rows.append((i, i + 1, a, b, res["cigar"]))
        expect[i] = (res["cigar"], nice["query_aligned"],
                     nice["matched_aligned"], nice["target_aligned"])
    got = _run(tmp_path, rows)
    assert set(got) == set(expect)
    for i, (cig, qa, ma, ta) in expect.items():
        assert got[i] == (i, cig, qa, ma, ta)


@pytest.mark.parametrize("cigar", [
    "5=",            # cost 0 but levenshtein is 1
    "2=1X2=",        # '=' run covers the actual mismatch position
    "1=1Xgarbage",   # unparseable tail -> under-consumes both inputs
    "1=1X2=",        # consumes 4 of 5 chars
    "1=1X3=1I",      # overruns the query
    "3=1X1=",        # right totals+cost but an '=' run copies differing text
    "2X3=",          # 'X' run covers a matching position
    "1=1I1D3=",      # valid replayable path but cost 2 > optimal 1
])
def test_corrupt_cigars_poison(tmp_path, cigar):
    got = _run(tmp_path, [(0, 1, "hello", "hxllo", cigar)])
    assert got[0][1] == "!invalid"


def test_valid_cigar_passes(tmp_path):
    got = _run(tmp_path, [(0, 1, "hello", "hxllo", "1=1X3=")])
    assert got[0][1] == "1=1X3="
    assert got[0][2:] == ("hello", "|.|||", "hxllo")


def test_leading_insertion_preference(tmp_path):
    """The reference rejects alignments that OPEN with an insertion
    while target context precedes the window (runTests.cpp:636-639:
    extending the window one char left turns that insertion into an
    equal-cost mismatch, which the reference prefers).  text_b here is
    the aligned target WINDOW; lead_ctx counts the target chars the
    free-start mode skipped before it."""
    # HW-style: window "ab" starts at target offset 1 (lead_ctx=1);
    # "1I2=" is valid and optimal for the window, but the reference
    # would have started one char earlier with "1X2=" — flagged.
    got = _run(tmp_path, [(0, 1, "aab", "ab", "1I2=", 1)])
    assert got[0][1] == "!invalid"
    # The same path with no preceding context (NW-like) is acceptable.
    got = _run(tmp_path, [(0, 1, "aab", "ab", "1I2=", 0)])
    assert got[0][1] == "1I2="
    # The preference-correct alternative (open with the mismatch by
    # widening the window left) passes regardless of context depth.
    got = _run(tmp_path, [(0, 1, "aab", "zab", "1X2=", 0)])
    assert got[0][1] == "1X2="


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_TEXT = st.text(alphabet="abcde", min_size=1, max_size=40)


@pytest.fixture(scope="module")
def prop_dir(tmp_path_factory):
    # one pytest-managed dir for ALL hypothesis examples (_run
    # overwrites its parquet in place) — per-example mkdtemp would
    # leak 30 /tmp dirs every suite run
    return tmp_path_factory.mktemp("cigar_prop")


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(q=_TEXT, t=_TEXT)
def test_certificate_property_random_paths(prop_dir, q, t):
    """Property: every kernel-produced NW path certifies, and bumping
    the first run length (which breaks the consumption totals by
    construction) is always flagged — hypothesis-shrunk counterexamples
    would localize any certificate/kernel disagreement."""
    import re

    cigar = kernel.align(q, t, mode="NW", task="path")["cigar"]
    got = _run(prop_dir, [(0, 1, q, t, cigar)])
    assert got[0][1] == cigar

    m = re.match(r"(\d+)", cigar)
    bad = str(int(m.group(1)) + 1) + cigar[m.end():]
    got = _run(prop_dir, [(0, 1, q, t, bad)])
    assert got[0][1] == "!invalid"


def test_op_sum_golden_parse(spark):
    """Pin the Spark-side CIGAR op-sum parse (align_ops_stats'
    _cigar_op_sum) on the reference golden path 2=3I1D2I1X2= plus
    edge shapes (single-run, empty, multi-digit runs)."""
    from pyspark.sql import functions as F

    from edlib_spark.driver_contract import _cigar_op_sum

    rows = [("2=3I1D2I1X2=",), ("12=",), ("",), ("10X25I3D",)]
    df = spark.createDataFrame(rows, "cigar string")
    got = [tuple(r) for r in df.select(
        F.col("cigar"),
        _cigar_op_sum("=").alias("e"), _cigar_op_sum("X").alias("x"),
        _cigar_op_sum("I").alias("i"), _cigar_op_sum("D").alias("d"))
        .collect()]
    expect = {"2=3I1D2I1X2=": (4, 1, 5, 1), "12=": (12, 0, 0, 0),
              "": (0, 0, 0, 0), "10X25I3D": (0, 10, 25, 3)}
    for cigar, e, x, i, d in got:
        assert (e, x, i, d) == expect[cigar], cigar


def test_ops_stats_oracle_poisons_on_invalid(tmp_path):
    """The ops-stats final_select must emit poison counts (-1) when
    the replay certificate fails, so a wrong path cannot grade as
    correct statistics."""
    from edlib_spark.driver_contract import _SQL_CIGAR_VALID

    final = f"""
    , opsum AS (
        SELECT id_a, id_b,
               CAST(coalesce(sum(CASE WHEN op = '=' THEN rl END), 0)
                    AS BIGINT) AS n_eq
        FROM ops GROUP BY id_a, id_b)
    SELECT p.id_a,
           CASE WHEN {_SQL_CIGAR_VALID} THEN o.n_eq
                ELSE CAST(-1 AS BIGINT) END AS n_eq
    FROM pairs p JOIN pc c USING (id_a, id_b)
    JOIN checked ch USING (id_a, id_b)
    JOIN opsum o USING (id_a, id_b)"""

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    def run(cigar):
        side = tmp_path / "side"
        side.mkdir(exist_ok=True)
        pq.write_table(pa.table({
            "id_a": pa.array([0], pa.int64()),
            "id_b": pa.array([1], pa.int64()),
            "cigar": [cigar]}), side / "part-0.parquet")
        con = duckdb.connect()
        con.execute("CREATE TABLE tp(id_a BIGINT, id_b BIGINT,"
                    " text_a VARCHAR, text_b VARCHAR, lead_ctx BIGINT)")
        con.execute("INSERT INTO tp VALUES (0, 1, 'kitten',"
                    " 'sitting', 0)")
        sql = _sql_cigar_replay(
            "SELECT id_a, id_b, text_a, text_b, lead_ctx FROM tp",
            str(side), final)
        return con.sql(sql).fetchall()[0]

    good = kernel.align("kitten", "sitting", mode="NW",
                        task="path")["cigar"]
    assert run(good)[1] == 4  # kitten/sitting: 4 matching columns
    assert run("7=") == (0, -1)  # wrong path -> poison, not counts
