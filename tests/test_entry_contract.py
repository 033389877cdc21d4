"""Contract tests for the driver entry module (VERDICT r4 #1/#10).

The per-round CORRECTNESS gate samples exactly the first 50 entries of
``queries()``; these tests pin the invariants that keep that window
meaningful: key-set parity with ``oracle_sql()``, full family coverage of
the window, and family-tag completeness over all queries.
"""

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry

WINDOW = 50


def test_queries_and_oracles_have_identical_key_sets():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))


def test_family_tags_cover_every_query_exactly_once():
    tagged = [q for fam in entry.QUERY_FAMILIES.values() for q in fam]
    assert len(tagged) == len(set(tagged)), "query tagged in two families"
    untagged = set(entry.queries()) - set(tagged)
    assert not untagged, f"queries missing a family tag: {sorted(untagged)}"
    ghost = set(tagged) - set(entry.queries())
    assert not ghost, f"family tags for unknown queries: {sorted(ghost)}"


def test_first_50_window_covers_every_family():
    window = set(list(entry.queries())[:WINDOW])
    missing = [
        fam
        for fam, members in entry.QUERY_FAMILIES.items()
        if fam not in entry._FAMILIES_OUTSIDE_WINDOW
        and not window & set(members)
    ]
    assert not missing, f"families with no first-50 representative: {missing}"


def test_window_representative_is_first_family_member():
    # The curated representative for each in-window family is its list head,
    # so the family table documents what the driver actually verifies.
    window = set(list(entry.queries())[:WINDOW])
    for fam, members in entry.QUERY_FAMILIES.items():
        if fam in entry._FAMILIES_OUTSIDE_WINDOW:
            continue
        assert members[0] in window, (fam, members[0])
