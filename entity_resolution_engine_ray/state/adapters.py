"""Conflict-flag adapters for the relational ER validation router.

Reference semantics (validation/adapters.py:48-223) preserved exactly:

- team:        ``country_mismatch``      — normalize_country(alpha.country) vs
               normalize_country(beta.region), both non-empty and different
               (adapters.py:56-63)
- competition: ``country_mismatch``      — alpha.country vs beta.locale
               (adapters.py:88-95)
- season:      ``season_year_mismatch``  — |alpha_start − beta_start| > 1
               over normalize_season start years (adapters.py:121-125)
- player:      ``dob_mismatch``          — |alpha.dob.year − beta.birth_year|
               > 1, both present (adapters.py:168-172)
- match:       ``date_mismatch``         — |alpha.match_date −
               beta.match_date| > 2 days (adapters.py:210)

A candidate whose score clears the auto-approve threshold but carries a
conflict flag is NEVER auto-approved (reference validation/router.py:168-170
— honored by state/router.route_matches via ``conflict_flags``); it takes the
gray-zone path instead (validator / fallback).

Each adapter takes the match-dict list plus the two source tables and returns
the same dicts with ``conflict_flags`` (and the reference's signal fields)
attached. Source tables here are dimension-sized (the relational surface);
the web-scale pages pipeline computes its conflict signals vectorized inside
the scorer instead.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from entity_resolution_engine_ray.functions.textnorm import (
    normalize_country,
    normalize_season,
)


def _rows_by(tbl, key: str) -> dict:
    t = tbl if isinstance(tbl, pa.Table) else tbl.to_arrow()
    return {r[key]: r for r in t.to_pylist()}


def _norm_country(value) -> str | None:
    if value is None or (isinstance(value, float) and pd.isna(value)):
        return None
    return normalize_country(str(value))


def _flags(conflict: str | None) -> list[str]:
    return [conflict] if conflict else []


def attach_team_conflicts(matches: list[dict], alpha_teams, beta_teams) -> list[dict]:
    a = _rows_by(alpha_teams, "team_id")
    b = _rows_by(beta_teams, "id")
    for m in matches:
        ac = _norm_country(a.get(m["alpha_team_id"], {}).get("country"))
        bc = _norm_country(b.get(m["beta_team_id"], {}).get("region"))
        conflict = "country_mismatch" if ac and bc and ac != bc else None
        m["country_match"] = (ac == bc) if ac else None
        m["conflict_flags"] = _flags(conflict)
    return matches


def attach_competition_conflicts(matches: list[dict], alpha_comps, beta_comps) -> list[dict]:
    a = _rows_by(alpha_comps, "competition_id")
    b = _rows_by(beta_comps, "id")
    for m in matches:
        ac = _norm_country(a.get(m["alpha_competition_id"], {}).get("country"))
        bc = _norm_country(b.get(m["beta_competition_id"], {}).get("locale"))
        conflict = "country_mismatch" if ac and bc and ac != bc else None
        m["country_match"] = (ac == bc) if ac else None
        m["conflict_flags"] = _flags(conflict)
    return matches


def attach_season_conflicts(matches: list[dict], alpha_seasons, beta_seasons) -> list[dict]:
    a = _rows_by(alpha_seasons, "season_id")
    b = _rows_by(beta_seasons, "id")
    for m in matches:
        a_start, _ = normalize_season(a.get(m["alpha_season_id"], {}).get("name", "") or "")
        b_start, _ = normalize_season(b.get(m["beta_season_id"], {}).get("label", "") or "")
        delta = abs(int(a_start) - int(b_start)) if a_start and b_start else None
        conflict = "season_year_mismatch" if delta is not None and delta > 1 else None
        m["start_year_delta"] = delta
        m["conflict_flags"] = _flags(conflict)
    return matches


def attach_player_conflicts(matches: list[dict], alpha_players, beta_players) -> list[dict]:
    a = _rows_by(alpha_players, "player_id")
    b = _rows_by(beta_players, "id")
    for m in matches:
        dob = a.get(m["alpha_player_id"], {}).get("dob")
        a_year = dob.year if dob is not None and not pd.isna(dob) else None
        by = b.get(m["beta_player_id"], {}).get("birth_year")
        b_year = int(by) if by is not None and not pd.isna(by) else None
        conflict = (
            "dob_mismatch" if a_year and b_year and abs(a_year - b_year) > 1 else None
        )
        m["birth_year_alpha"] = a_year
        m["birth_year_beta"] = b_year
        m["conflict_flags"] = _flags(conflict)
    return matches


def attach_match_conflicts(matches: list[dict], alpha_matches, beta_matches) -> list[dict]:
    a = _rows_by(alpha_matches, "match_id")
    b = _rows_by(beta_matches, "id")
    for m in matches:
        ad = a.get(m["alpha_match_id"], {}).get("match_date")
        bd = b.get(m["beta_match_id"], {}).get("match_date")
        delta = None
        if ad is not None and bd is not None and not pd.isna(ad) and not pd.isna(bd):
            delta = abs((pd.Timestamp(ad) - pd.Timestamp(bd)).days)
        conflict = "date_mismatch" if delta is not None and delta > 2 else None
        m["date_delta_days"] = delta
        m["conflict_flags"] = _flags(conflict)
    return matches
