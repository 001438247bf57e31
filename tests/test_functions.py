"""Unit pins for the scalar function layer.

The pinned cases are carried over from the reference's test suite
(tests/test_basic_mapping.py:14-24, 63-66) so the normalizer/scorer semantics
are byte/value-identical.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_engine_ray.functions.ids import build_lineage, cluster_entity_id, generate_ues_id
from entity_resolution_engine_ray.functions.scoring import (
    date_similarity_days,
    dob_similarity_years,
    match_confidence,
    player_confidence,
    season_year_confidence,
)
from entity_resolution_engine_ray.functions.similarity import (
    hamming_similarity64,
    indel_ratio,
    jaro_winkler,
    lcs_length,
    lsh_band_keys,
    minhash_coefficients,
    minhash_jaccard_estimate,
    minhash_signature,
    ngram_jaccard,
    shingle_hashes,
    simhash64,
    stable_hash64,
    token_jaccard,
    token_sort_ratio,
    hash_tokens,
)
from entity_resolution_engine_ray.functions.textnorm import (
    apply_team_alias,
    normalize_competition,
    normalize_country,
    normalize_name,
    normalize_season,
)


# ---------------------------------------------------------------- normalizers


def test_normalize_season_pins():
    # reference tests/test_basic_mapping.py:14-17
    assert normalize_season("2020/21") == (2020, 2021)
    assert normalize_season("20-21") == (2020, 2021)
    assert normalize_season("2020") == (2020, 2021)
    assert normalize_season("") == (None, None)
    assert normalize_season(None) == (None, None)
    assert normalize_season("garbage") == (None, None)
    assert normalize_season("1998") == (1998, 1999)
    assert normalize_season("95/96") == (1995, 1996)
    assert normalize_season("2021-2020") == (2021, 2022)  # end<start → start+1
    assert normalize_season("Season 2020 / 21 finals") == (2020, 2021)


def test_normalize_name_pins():
    assert normalize_name(None) == ""
    assert normalize_name("") == ""
    assert normalize_name("  Real  Madrid  ") == "real madrid"
    assert normalize_name("São Paulo FC") == "sao paulo football club"
    # punct→space leaves a trailing space the reference never re-strips;
    # pinned exactly (reference name_normalizer.py:14-26 has no final strip)
    assert normalize_name("City F.C.") == "city f c "
    assert normalize_name("City FC") == "city football club"
    assert normalize_name("AFC Wimbledon") == "afc wimbledon"  # \bfc\b does not hit afc


def test_fc_alias_similarity_pin():
    # reference tests/test_basic_mapping.py:20-23
    a = normalize_name("City FC")
    b = normalize_name("City Football Club")
    assert token_sort_ratio(a, b) > 0.8


def test_normalize_competition():
    assert normalize_competition("Premier League presented by MegaCorp") == "premier league megacorp"
    assert normalize_competition("  La   Liga ") == "la liga"
    assert normalize_competition(None) == ""


def test_normalize_country():
    assert normalize_country("brasil") == "Brazil"
    assert normalize_country("BR") == "Brazil"
    assert normalize_country("united states") == "USA"
    assert normalize_country("Narnia") == "Narnia"
    assert normalize_country("") == ""


def test_apply_team_alias():
    assert apply_team_alias("Man City") == "manchester city"
    assert apply_team_alias("Arsenal") == "Arsenal"


# ---------------------------------------------------------------- similarity


def _lcs_dp(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m):
        for j in range(n):
            dp[i + 1][j + 1] = dp[i][j] + 1 if a[i] == b[j] else max(dp[i][j + 1], dp[i + 1][j])
    return dp[m][n]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdef ", max_size=40), st.text(alphabet="abcdef ", max_size=40))
def test_lcs_bitparallel_matches_dp(a, b):
    assert lcs_length(a, b) == _lcs_dp(a, b)


def test_indel_ratio_basics():
    assert indel_ratio("abc", "abc") == 1.0
    assert indel_ratio("", "") == 1.0
    assert indel_ratio("abc", "") == 0.0
    # rapidfuzz.fuzz.ratio("kitten","sitting") = 61.538461...
    assert indel_ratio("kitten", "sitting") == pytest.approx(8 / 13)


def test_token_sort_ratio():
    assert token_sort_ratio("", "x") == 0.0
    assert token_sort_ratio("hello world", "world hello") == 1.0
    assert 0.0 < token_sort_ratio("john doe", "jon doe") < 1.0


def test_jaro_winkler():
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-2)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "") == 0.0


def test_token_and_ngram_jaccard():
    assert token_jaccard({"a", "b"}, {"a", "b"}) == 1.0
    assert token_jaccard({"a"}, {"b"}) == 0.0
    assert token_jaccard(set(), set()) == 1.0
    assert ngram_jaccard("abcd", "abcd") == 1.0
    assert 0 < ngram_jaccard("abcde", "abcdf") < 1


# ---------------------------------------------------------------- sketches


def test_stable_hash_is_stable():
    assert stable_hash64("hello") == stable_hash64("hello")
    assert stable_hash64("hello") != stable_hash64("hellp")


def test_minhash_estimates_jaccard():
    a, b = minhash_coefficients(128)
    toks1 = [f"tok{i}" for i in range(100)]
    toks2 = [f"tok{i}" for i in range(50, 150)]  # true overlap 50/150 = 1/3
    h1 = hash_tokens(toks1)
    h2 = hash_tokens(toks2)
    s1 = minhash_signature(shingle_hashes(h1, k=1), a, b)
    s2 = minhash_signature(shingle_hashes(h2, k=1), a, b)
    est = minhash_jaccard_estimate(s1, s2)
    assert est == pytest.approx(1 / 3, abs=0.12)
    assert minhash_jaccard_estimate(s1, s1) == 1.0


def test_lsh_band_keys_deterministic_and_band_count():
    a, b = minhash_coefficients(64)
    sig = minhash_signature(shingle_hashes(hash_tokens(list("abcdefgh")), k=2), a, b)
    k1 = lsh_band_keys(sig, bands=16)
    k2 = lsh_band_keys(sig, bands=16)
    assert k1 == k2 and len(k1) == 16
    # identical docs share all band keys
    assert lsh_band_keys(sig, 16) == k1


def test_simhash_similarity():
    h1 = hash_tokens([f"w{i}" for i in range(200)])
    h2 = hash_tokens([f"w{i}" for i in range(190)] + [f"x{i}" for i in range(10)])
    h3 = hash_tokens([f"y{i}" for i in range(200)])
    s1, s2, s3 = simhash64(h1), simhash64(h2), simhash64(h3)
    assert hamming_similarity64(s1, s1) == 1.0
    assert hamming_similarity64(s1, s2) > hamming_similarity64(s1, s3)


# ---------------------------------------------------------------- field scores


def test_dob_similarity():
    out = dob_similarity_years(np.array([1995, 1995, 1995, np.nan]), np.array([1995, 1996, 1998, 1995]))
    assert list(out) == [1.0, 0.6, 0.0, 0.0]


def test_date_similarity():
    out = date_similarity_days(np.array([0, 1, 2, np.nan]))
    assert list(out) == [1.0, 0.8, 0.0, 0.0]


def test_season_year_confidence():
    out = season_year_confidence(np.array([2020, 2020, 2020, np.nan]), np.array([2020, 2021, 2023, 2020]))
    assert list(out) == [1.0, 0.7, 0.0, 0.0]


def test_player_confidence_pin():
    # reference tests/test_basic_mapping.py:58-60 — John Doe vs Jon Doe,
    # same birth year, team agreement ⇒ ≥ 0.85
    name = token_sort_ratio(normalize_name("John Doe"), normalize_name("Jon Doe"))
    conf = player_confidence(np.array([name]), np.array([1.0]), np.array([1.0]))[0]
    assert conf >= 0.85


def test_match_confidence():
    assert match_confidence(np.array([1.0]), np.array([1.0]))[0] == pytest.approx(1.0)
    assert match_confidence(np.array([1.0]), np.array([0.0]))[0] == pytest.approx(0.7)


# ---------------------------------------------------------------- ids


def test_generate_ues_id_deterministic():
    # reference tests/test_basic_mapping.py:63-66
    a = generate_ues_id("UESP", 1, 2)
    b = generate_ues_id("UESP", 1, 2)
    assert a == b and a.startswith("UESP-") and len(a) == 13
    assert generate_ues_id("UESP", 2, 1) != a


def test_cluster_entity_id_order_invariant():
    assert cluster_entity_id("ENT", ["b", "a"]) == cluster_entity_id("ENT", ["a", "b"])


def test_build_lineage_shape():
    doc = build_lineage("team", 1, 2, 0.9, {"name_similarity": 0.9})
    assert doc["sources"] == [
        {"source": "ALPHA", "id": "1"},
        {"source": "BETA", "id": "2"},
    ]
    assert doc["entity_type"] == "team"


def test_char_ngram_hashes_match_gram_strings():
    """Vectorized char-ngram ids must reproduce gram-STRING identity:
    Jaccard over unique ids == Jaccard over ngram_set strings (injective
    packing for n=3), including unicode, short texts, and empties."""
    import numpy as np

    from entity_resolution_engine_ray.functions.similarity import (
        char_ngram_hashes,
        ngram_jaccard,
        ngram_set,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumped over the lazy dog",
        "naïve café über-motörhead",  # multi-byte code points
        "ab",  # shorter than n
        "",
        "aaaaaaa",  # heavy duplicate windows
        "abcabcabc",
    ]
    ids = {t: np.unique(char_ngram_hashes(t.lower(), 3)) for t in texts}
    for t in texts:
        assert len(ids[t]) == len(ngram_set(t.lower(), 3))  # injective per doc
    for a in texts:
        for b in texts:
            sa, sb = ids[a], ids[b]
            if len(sa) == 0 and len(sb) == 0:
                continue
            inter = len(np.intersect1d(sa, sb))
            union = len(sa) + len(sb) - inter
            want = ngram_jaccard(a.lower(), b.lower(), 3)
            assert abs(inter / union - want) < 1e-12, (a, b)


def test_soundex_published_vectors():
    # the U.S. National Archives specification's worked examples
    from entity_resolution_engine_ray.functions.phonetic import soundex

    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"  # H transparent between S and C
    assert soundex("Ashcroft") == "A261"
    assert soundex("Tymczak") == "T522"   # vowel separates C-Z from K
    assert soundex("Pfister") == "P236"   # F follows same-code P, collapses
    assert soundex("Honeyman") == "H555"
    assert soundex("Washington") == "W252"
    # padding, case, non-letters, degenerate inputs
    assert soundex("Lee") == "L000"
    assert soundex("o'Brien") == "O165"
    assert soundex("") == ""
    assert soundex(None) == ""
    assert soundex("123") == ""


def test_soundex_batch_matches_scalar_with_nulls():
    import pyarrow as pa

    from entity_resolution_engine_ray.functions.phonetic import soundex, soundex_batch

    vals = ["Robert", None, "Tymczak", "Robert", "", "Pfister"] * 50
    out = soundex_batch(pa.chunked_array([vals[:100], vals[100:]])).to_pylist()
    exp = [soundex(v) if v is not None else "" for v in vals]
    assert out == exp
