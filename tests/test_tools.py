"""Guards for the tooling layer: the cross-scale checker's override
map must stay in sync with the driver contract, or a renamed query
would silently fall back to its (possibly infeasible) full oracle."""

import os
import sys


def _tools_dir_on_path():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tools = os.path.join(repo, "tools")
    for p in (repo, tools):
        if p not in sys.path:
            sys.path.insert(0, p)


def test_cross_scale_overrides_match_contract():
    _tools_dir_on_path()
    import cross_scale_check as xs

    import __spark_entry__ as entry

    # build_overrides only CLOSES OVER spark/sf_dir; nothing executes
    # until a lambda is called, so None is fine for a shape check.
    over = xs.build_overrides(None, "/nonexistent")
    contract = set(entry.queries())
    supporting = {"training_edges_sampled"}
    assert set(over) - supporting <= contract, set(over) - contract
    # exactly the 8 quadratic-oracle queries are overridden
    assert set(over) - supporting == {
        "scored_pairs_nw", "match_edges", "clusters",
        "clusters_incremental", "doc_minhash_neardup",
        "doc_neardup_clusters", "doc_dedup_corpus",
        "doc_training_corpus"}
    # every override carries a tag the report prints
    assert all(len(v) == 3 and v[2] for v in over.values())
