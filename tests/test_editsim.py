"""Edit-distance similarity join (stages/editsim): kernel parity vs a
serial DP oracle, the FastSS deletion-blocking completeness guarantee, and
the distributed join vs brute force."""

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_engine_ray.stages.editsim import (
    deletion_variants,
    fuzzy_self_join,
    levenshtein_pairs,
)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


def test_levenshtein_pins():
    a = ["", "a", "kitten", "small ring", "red widget", "flaw", "é€x"]
    b = ["", "", "sitting", "small ring", "red widgets", "lawn", "éx"]
    assert levenshtein_pairs(a, b).tolist() == [0, 1, 3, 0, 1, 2, 1]
    # symmetric
    assert levenshtein_pairs(b, a).tolist() == [0, 1, 3, 0, 1, 2, 1]
    assert levenshtein_pairs([], []).tolist() == []


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="abcé ", max_size=12), st.text(alphabet="abcé ", max_size=12)),
        max_size=20,
    )
)
def test_levenshtein_matches_dp_oracle(pairs):
    got = levenshtein_pairs([p[0] for p in pairs], [p[1] for p in pairs])
    assert got.tolist() == [_lev(a, b) for a, b in pairs]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc", max_size=8), st.text(alphabet="abc", max_size=8))
def test_deletion_blocking_is_lossless(a, b):
    # FastSS guarantee: lev(a,b) <= t  =>  the <=t-deletion neighbourhoods
    # intersect (the property that makes the blocked join exact)
    if _lev(a, b) <= 2:
        assert deletion_variants(a, 2) & deletion_variants(b, 2)


def test_fuzzy_self_join_matches_brute_force(ray_session):
    import ray.data as rd

    names = [
        "small ring", "smal ring", "small rings", "red widget", "red widgets",
        "blue bolt", "blue bolts", "hot gear", "hot bear", "cold gear",
        "unrelated thing", "another one", "xx", "x", "",
    ]
    ds = rd.from_items([{"k": i, "name": n} for i, n in enumerate(names)])
    out = fuzzy_self_join(ds, "k", "name", max_dist=2).to_pandas()
    got = {(r.key_a, r.key_b, r.dist) for r in out.itertuples()}
    exp = {
        (i, j, _lev(names[i], names[j]))
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if _lev(names[i], names[j]) <= 2
    }
    assert got == exp
    # names ride along correctly
    for r in out.itertuples():
        assert r.name_a == names[r.key_a] and r.name_b == names[r.key_b]


def test_fuzzy_self_join_empty_and_carry(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"k": 1, "name": "abc", "w": 10}, {"k": 2, "name": "abd", "w": 20}])
    out = fuzzy_self_join(ds, "k", "name", max_dist=1, carry_cols=("w",)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.key_a, row.key_b, row.dist, row.w_a, row.w_b) == (1, 2, 1, 10, 20)
    far = rd.from_items([{"k": 1, "name": "abc"}, {"k": 2, "name": "xyzuvw"}])
    assert fuzzy_self_join(far, "k", "name", max_dist=2).to_pandas().empty


def test_fuzzy_cross_join_matches_brute_force(ray_session):
    import ray.data as rd

    a = ["small ring", "red widget", "hot gear", "only in a", "shared"]
    b = ["smal ring", "red widgets", "hot gear", "only in b", "shared"]
    ds_a = rd.from_items([{"k": i, "name": n} for i, n in enumerate(a)])
    ds_b = rd.from_items([{"k": 100 + i, "name": n} for i, n in enumerate(b)])
    from entity_resolution_engine_ray.stages.editsim import fuzzy_join

    res = fuzzy_join(ds_a, ds_b, "k", "name", max_dist=2).to_pandas()
    got = {(r.key_a, r.key_b, r.dist) for r in res.itertuples()}
    exp = {
        (i, 100 + j, _lev(a[i], b[j]))
        for i in range(len(a))
        for j in range(len(b))
        if _lev(a[i], b[j]) <= 2
    }
    assert got == exp
    # dist-0 cross matches included; no within-side pairs possible by key range
    assert (0, 100 + 0, 1) in got and (4, 104, 0) in got
    assert all(ka < 100 <= kb for ka, kb, _ in got)


def test_fuzzy_self_join_null_strings_never_match(ray_session):
    # SQL semantics: levenshtein(NULL, x) is NULL, never <= t
    import ray.data as rd

    ds = rd.from_items(
        [{"k": 1, "name": "abc"}, {"k": 2, "name": None}, {"k": 3, "name": "abd"}]
    )
    out = fuzzy_self_join(ds, "k", "name", max_dist=2).to_pandas()
    assert sorted(zip(out.key_a, out.key_b)) == [(1, 3)]
