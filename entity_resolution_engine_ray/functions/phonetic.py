"""Phonetic encoding for blocking: American Soundex.

Soundex is the textbook phonetic blocking key of the record-linkage
literature (Christen's indexing survey lists it first among phonetic
schemes): names that sound alike get the same 4-character code, so
typo/spelling variants land in the same block without any pair scoring.
The reference engine blocks on normalized exact keys only
(/root/reference/entity_resolution_engine/matching/teams.py builds candidate sets from
normalized-name equality); soundex adds the classic recall-oriented
alternative for dirty name columns.

Algorithm (public domain, the U.S. National Archives specification):
keep the first letter; map the rest B F P V→1, C G J K Q S X Z→2,
D T→3, L→4, M N→5, R→6; vowels A E I O U Y separate duplicate codes,
H and W do not; adjacent same codes collapse (including a code equal to
the FIRST letter's code); pad/truncate to letter + 3 digits. Non-ASCII
letters are dropped before encoding; an input with no ASCII letter
encodes to the empty string.

Scale note: ``soundex_batch`` dictionary-encodes first and runs the
per-string scan only over UNIQUE values — on a web corpus the name
column's unique count is orders of magnitude below the row count, which
is the same unique-first trick the scoring stage uses for titles
(stages/score.py dictionary-encoded titles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CODE = {}
for _letters, _digit in (
    ("BFPV", "1"),
    ("CGJKQSXZ", "2"),
    ("DT", "3"),
    ("L", "4"),
    ("MN", "5"),
    ("R", "6"),
):
    for _ch in _letters:
        _CODE[_ch] = _digit
# vowels (and Y) reset the "previous code" separator; H/W are transparent
_SEPARATORS = set("AEIOUY")


def soundex(value: str | None) -> str:
    """American Soundex code (e.g. 'Robert' -> 'R163'); '' for inputs
    without an ASCII letter. Deterministic, pure function of the input."""
    if value is None:
        return ""
    letters = [c for c in value.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    first = letters[0]
    out = [first]
    prev = _CODE.get(first, "")
    for ch in letters[1:]:
        code = _CODE.get(ch, "")
        if code:
            if code != prev:
                out.append(code)
                if len(out) == 4:
                    break
            prev = code
        elif ch in _SEPARATORS:
            prev = ""
        # H and W: keep prev unchanged (transparent)
    return "".join(out) + "0" * (4 - len(out))


def soundex_batch(arr) -> pa.Array:
    """Vectorized-by-uniques soundex over a pyarrow/numpy string array:
    dictionary-encode, scan each UNIQUE string once, take back out."""
    if not isinstance(arr, pa.Array) and not isinstance(arr, pa.ChunkedArray):
        arr = pa.array(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = arr.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    codes = np.array([soundex(u) for u in uniq], dtype=object)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    out = np.full(len(arr), "", dtype=object)
    valid = ~pd_isna(idx)
    out[valid] = codes[idx[valid].astype(np.int64)]
    return pa.array(out, pa.string())


def pd_isna(a: np.ndarray) -> np.ndarray:
    """NaN mask for a float-or-int indices array (nulls decode to NaN)."""
    if a.dtype.kind == "f":
        return np.isnan(a)
    return np.zeros(len(a), dtype=bool)
