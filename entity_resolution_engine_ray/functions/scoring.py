"""Field-level similarity scores used by the relational matchers.

Reference semantics:
- ``dob_similarity``  — ``matchers/players_matcher.py:26-33`` (same year → 1.0,
  ±1 year → DOB_PARTIAL_SCORE=0.6, else 0.0; NaN-safe).
- ``date_similarity`` — ``matchers/matches_matcher.py:15-23`` (Δ0 days → 1.0,
  Δ≤1 day → 0.8, else 0.0; NaN-safe).
- ``season_year_confidence`` — ``matchers/seasons_matcher.py:33-39`` (start-year
  Δ0 → 1.0, Δ1 → 0.7, else 0.0).
- player weighted confidence — ``matchers/players_matcher.py:19-23,63-68``:
  0.6*name + 0.3*dob + 0.1*team.
- match confidence — ``matchers/matches_matcher.py:62``: 0.4*team + 0.3*date + 0.3.

All vectorized forms operate on numpy arrays (the Ray matchers call them per
batch/group); NaN/None handling matches the pandas ``isna`` guards.
"""

from __future__ import annotations

import numpy as np

DOB_PARTIAL_SCORE = 0.6

PLAYER_WEIGHTS = {"name": 0.6, "dob": 0.3, "team": 0.1}


def dob_similarity_years(alpha_year: np.ndarray, beta_year: np.ndarray) -> np.ndarray:
    """Vectorized over float arrays (NaN = missing)."""
    a = np.asarray(alpha_year, dtype=np.float64)
    b = np.asarray(beta_year, dtype=np.float64)
    delta = np.abs(a - b)
    out = np.where(delta == 0, 1.0, np.where(delta == 1, DOB_PARTIAL_SCORE, 0.0))
    return np.where(np.isnan(a) | np.isnan(b), 0.0, out)


def date_similarity_days(delta_days: np.ndarray) -> np.ndarray:
    """Vectorized over |Δdays| float arrays (NaN = missing)."""
    d = np.abs(np.asarray(delta_days, dtype=np.float64))
    out = np.where(d == 0, 1.0, np.where(d <= 1, 0.8, 0.0))
    return np.where(np.isnan(d), 0.0, out)


def season_year_confidence(alpha_start: np.ndarray, beta_start: np.ndarray) -> np.ndarray:
    """Vectorized; 0/None start years score 0.0 (reference truthiness guard)."""
    a = np.asarray(alpha_start, dtype=np.float64)
    b = np.asarray(beta_start, dtype=np.float64)
    delta = np.abs(a - b)
    out = np.where(delta == 0, 1.0, np.where(delta == 1, 0.7, 0.0))
    missing = np.isnan(a) | np.isnan(b) | (a == 0) | (b == 0)
    return np.where(missing, 0.0, out)


def player_confidence(
    name_score: np.ndarray, dob_score: np.ndarray, team_score: np.ndarray
) -> np.ndarray:
    return (
        PLAYER_WEIGHTS["name"] * np.asarray(name_score, dtype=np.float64)
        + PLAYER_WEIGHTS["dob"] * np.asarray(dob_score, dtype=np.float64)
        + PLAYER_WEIGHTS["team"] * np.asarray(team_score, dtype=np.float64)
    )


def match_confidence(team_score: np.ndarray, date_score: np.ndarray) -> np.ndarray:
    return 0.4 * np.asarray(team_score, dtype=np.float64) + 0.3 * np.asarray(
        date_score, dtype=np.float64
    ) + 0.3
