"""Deterministic two-source relational fixtures (the reference's seeded
Alpha/Beta synthetic data, re-created from scratch).

Mirrors the reference generators' structure — seeds 42 (alpha) / 1337
(beta mutations), overlapping-but-mutated entities (reference
synthetic/generate_alpha_data.py:19-24, generate_beta_data.py:19-29,36-61) —
with this engine's own vocabulary and code. Ground truth overlap: 30/40
teams, 9/12 competitions, 1600/2000 players shared.

Schemas (reference db/alpha_schema.sql, db/beta_schema.sql):
  alpha: teams(team_id,name,country,active), competitions(competition_id,
  name,country), seasons(season_id,name,competition_id), players(player_id,
  name,dob,nationality,height_cm,foot,team_id,active), matches(match_id,
  home_team_id,away_team_id,season_id,competition_id,match_date)
  beta: teams(id,display_name,region,active), competitions(id,title,locale),
  seasons(id,label,competition_id), players(id,full_name,birth_year,
  nationality,height_cm,footedness,team_name,is_active), matches(id,
  home_team_id,away_team_id,season_id,competition_id,match_date)
"""

from __future__ import annotations

from datetime import date, timedelta

import numpy as np
import pyarrow as pa

_FIRST = ["John", "Liam", "Noah", "Oliver", "Elijah", "James", "Lucas", "Mason",
          "Ethan", "Diego", "Mateo", "Hugo", "Luca", "Karim", "Tomas", "Pedro",
          "Jonas", "Felix", "Marco", "Andre"]
_LAST = ["Doe", "Smith", "Silva", "Santos", "Muller", "Schmidt", "Garcia",
         "Martinez", "Rossi", "Ferrari", "Dubois", "Laurent", "Jensen",
         "Nielsen", "Kovacs", "Novak", "Ivanov", "Costa", "Moreau", "Weber"]
_CITY = ["River", "United", "Rovers", "Athletic", "City", "Town", "Wanderers",
         "Rangers", "Albion", "County", "Harbor", "Summit", "Valley", "North",
         "South", "East", "West", "Central", "Royal", "Old"]
_PLACE = ["Avalon", "Brighton", "Calder", "Dunmore", "Eastvale", "Foxford",
          "Glenside", "Hartley", "Irondale", "Jasperton", "Kestrel", "Lakewood",
          "Midhurst", "Northgate", "Oakham", "Pinebrook", "Quarry", "Redcliff",
          "Stonebridge", "Thornton"]
_COUNTRIES = ["England", "Brazil", "Germany", "USA", "Spain", "France"]

N_ALPHA_TEAMS, N_BETA_TEAMS, N_SHARED_TEAMS = 40, 50, 30
N_ALPHA_COMPS, N_BETA_COMPS, N_SHARED_COMPS = 12, 12, 9
N_SEASONS = 36
N_ALPHA_PLAYERS, N_BETA_PLAYERS, N_SHARED_PLAYERS = 2000, 2300, 1600
N_ALPHA_MATCHES, N_BETA_MATCHES, N_SHARED_MATCHES = 800, 900, 700


_MASCOT = ["Falcons", "Wolves", "Lions", "Eagles", "Tigers", "Bears", "Hawks",
           "Otters", "Ravens", "Foxes", "Stags", "Bulls", "Herons", "Vipers",
           "Condors", "Badgers", "Lynx", "Owls", "Cranes", "Ibis"]


def _team_name(rng) -> str:
    # three words from disjoint pools keeps cross-team token overlap ≤ 1/3,
    # so the 0.7 token-sort threshold cleanly separates true mutations from
    # coincidental similarity
    return (
        f"{_PLACE[rng.integers(0, len(_PLACE))]} "
        f"{_CITY[rng.integers(0, len(_CITY))]} "
        f"{_MASCOT[rng.integers(0, len(_MASCOT))]}"
    )


def _mutate_team_name(name: str, rng) -> str:
    r = rng.random()
    if r < 0.3:
        return name + " FC"
    if r < 0.5:
        return name + " Club"
    if r < 0.6:
        return name + " SC"
    return name


def _mutate_competition_name(name: str, rng) -> str:
    r = rng.random()
    if r < 0.3:
        return name + " Showcase"
    if r < 0.5:
        return name + " presented by MegaCorp"
    return name


def _mutate_player_name(name: str, rng) -> str:
    first, last = name.split(" ", 1)
    r = rng.random()
    if r < 0.25:
        return f"{first[:3]} {last}"  # truncation: John → Joh
    if r < 0.45:
        return f"{first[0]}. {last}"  # initial
    if r < 0.55:
        return f"{name} Jr"
    return name


def generate_relational_fixtures(seed_alpha: int = 42, seed_beta: int = 1337) -> dict[str, dict[str, pa.Table]]:
    rng_a = np.random.default_rng(seed_alpha)
    rng_b = np.random.default_rng(seed_beta)

    # ---- teams
    team_names = []
    seen = set()
    while len(team_names) < N_ALPHA_TEAMS + (N_BETA_TEAMS - N_SHARED_TEAMS):
        n = _team_name(rng_a)
        if n not in seen:
            seen.add(n)
            team_names.append(n)
    alpha_team_names = team_names[:N_ALPHA_TEAMS]
    team_country = [_COUNTRIES[rng_a.integers(0, len(_COUNTRIES))] for _ in team_names]
    alpha_teams = pa.table(
        {
            "team_id": pa.array(range(1, N_ALPHA_TEAMS + 1), type=pa.int64()),
            "name": pa.array(alpha_team_names),
            "country": pa.array(team_country[:N_ALPHA_TEAMS]),
            "active": pa.array([True] * N_ALPHA_TEAMS),
        }
    )
    # beta: first N_SHARED_TEAMS are mutated alpha teams, rest are unique
    beta_team_names = [
        _mutate_team_name(alpha_team_names[i], rng_b) for i in range(N_SHARED_TEAMS)
    ] + team_names[N_ALPHA_TEAMS:]
    beta_team_countries = team_country[:N_SHARED_TEAMS] + team_country[N_ALPHA_TEAMS:]
    beta_teams = pa.table(
        {
            "id": pa.array(range(101, 101 + N_BETA_TEAMS), type=pa.int64()),
            "display_name": pa.array(beta_team_names),
            "region": pa.array(beta_team_countries),
            "active": pa.array([True] * N_BETA_TEAMS),
        }
    )
    # ground-truth team map: alpha team_id i+1 ↔ beta id 101+i for i < 30
    shared_team_map = {i + 1: 101 + i for i in range(N_SHARED_TEAMS)}

    # ---- competitions
    comp_names = [f"{_PLACE[i]} {['League', 'Cup', 'Trophy', 'Series'][i % 4]}" for i in range(N_ALPHA_COMPS + (N_BETA_COMPS - N_SHARED_COMPS))]
    alpha_comps = pa.table(
        {
            "competition_id": pa.array(range(1, N_ALPHA_COMPS + 1), type=pa.int64()),
            "name": pa.array(comp_names[:N_ALPHA_COMPS]),
            "country": pa.array([_COUNTRIES[i % len(_COUNTRIES)] for i in range(N_ALPHA_COMPS)]),
        }
    )
    beta_comp_titles = [
        _mutate_competition_name(comp_names[i], rng_b) for i in range(N_SHARED_COMPS)
    ] + comp_names[N_ALPHA_COMPS:]
    beta_comps = pa.table(
        {
            "id": pa.array(range(201, 201 + N_BETA_COMPS), type=pa.int64()),
            "title": pa.array(beta_comp_titles),
            "locale": pa.array(
                [_COUNTRIES[i % len(_COUNTRIES)] for i in range(N_SHARED_COMPS)]
                + [_COUNTRIES[(i + 1) % len(_COUNTRIES)] for i in range(N_BETA_COMPS - N_SHARED_COMPS)]
            ),
        }
    )

    # ---- seasons: 3 per shared competition; alpha "2020/21", beta "2020-21"
    a_rows, b_rows = [], []
    sid = 1
    for ci in range(N_SEASONS // 3):
        comp_a = (ci % N_ALPHA_COMPS) + 1
        comp_b = 201 + (ci % N_BETA_COMPS)
        for y in (2019, 2020, 2021):
            a_rows.append((sid, f"{y}/{str(y + 1)[2:]}", comp_a))
            b_rows.append((300 + sid, f"{y}-{str(y + 1)[2:]}", comp_b))
            sid += 1
    alpha_seasons = pa.table(
        {
            "season_id": pa.array([r[0] for r in a_rows], type=pa.int64()),
            "name": pa.array([r[1] for r in a_rows]),
            "competition_id": pa.array([r[2] for r in a_rows], type=pa.int64()),
        }
    )
    beta_seasons = pa.table(
        {
            "id": pa.array([r[0] for r in b_rows], type=pa.int64()),
            "label": pa.array([r[1] for r in b_rows]),
            "competition_id": pa.array([r[2] for r in b_rows], type=pa.int64()),
        }
    )

    # ---- players
    def player_name(rng):
        return f"{_FIRST[rng.integers(0, len(_FIRST))]} {_LAST[rng.integers(0, len(_LAST))]} {rng.integers(1, 9999):04d}"

    alpha_player_names = [player_name(rng_a) for _ in range(N_ALPHA_PLAYERS)]
    birth_years = rng_a.integers(1985, 2006, size=N_ALPHA_PLAYERS)
    dob_days = rng_a.integers(0, 365, size=N_ALPHA_PLAYERS)
    heights = rng_a.integers(165, 200, size=N_ALPHA_PLAYERS)
    feet = [["left", "right", "right"][int(rng_a.integers(0, 3))] for _ in range(N_ALPHA_PLAYERS)]
    nationalities = [_COUNTRIES[int(rng_a.integers(0, len(_COUNTRIES)))] for _ in range(N_ALPHA_PLAYERS)]
    a_team_ids = rng_a.integers(1, N_ALPHA_TEAMS + 1, size=N_ALPHA_PLAYERS)
    alpha_players = pa.table(
        {
            "player_id": pa.array(range(1, N_ALPHA_PLAYERS + 1), type=pa.int64()),
            "name": pa.array(alpha_player_names),
            "dob": pa.array(
                [date(int(by), 1, 1) + timedelta(days=int(d)) for by, d in zip(birth_years, dob_days)],
                type=pa.date32(),
            ),
            "nationality": pa.array(nationalities),
            "height_cm": pa.array(heights, type=pa.int32()),
            "foot": pa.array(feet),
            "team_id": pa.array(a_team_ids, type=pa.int64()),
            "active": pa.array([True] * N_ALPHA_PLAYERS),
        }
    )
    # beta players: first 1600 are mutated alpha players (same birth year,
    # team mapped via shared_team_map when possible), rest unique
    b_names, b_years, b_team_names_col, b_nat, b_h, b_footed = [], [], [], [], [], []
    for i in range(N_SHARED_PLAYERS):
        b_names.append(_mutate_player_name(alpha_player_names[i], rng_b))
        b_years.append(int(birth_years[i]))
        a_tid = int(a_team_ids[i])
        if a_tid in shared_team_map:
            b_team_names_col.append(beta_team_names[a_tid - 1])
        else:
            b_team_names_col.append(beta_team_names[int(rng_b.integers(0, N_BETA_TEAMS))])
        b_nat.append(nationalities[i])
        b_h.append(int(heights[i]))
        b_footed.append(["left-footed", "right-footed"][feet[i] == "right"])
    for i in range(N_BETA_PLAYERS - N_SHARED_PLAYERS):
        b_names.append(player_name(rng_b))
        b_years.append(int(rng_b.integers(1985, 2006)))
        b_team_names_col.append(beta_team_names[int(rng_b.integers(0, N_BETA_TEAMS))])
        b_nat.append(_COUNTRIES[int(rng_b.integers(0, len(_COUNTRIES)))])
        b_h.append(int(rng_b.integers(165, 200)))
        b_footed.append(["left-footed", "right-footed"][int(rng_b.integers(0, 2))])
    beta_players = pa.table(
        {
            "id": pa.array(range(5001, 5001 + N_BETA_PLAYERS), type=pa.int64()),
            "full_name": pa.array(b_names),
            "birth_year": pa.array(b_years, type=pa.int32()),
            "nationality": pa.array(b_nat),
            "height_cm": pa.array(b_h, type=pa.int32()),
            "footedness": pa.array(b_footed),
            "team_name": pa.array(b_team_names_col),
            "is_active": pa.array([True] * N_BETA_PLAYERS),
        }
    )

    # ---- matches: shared matches use shared teams/comps/seasons; date ±1 day
    am, bm = [], []
    base = date(2021, 1, 1)
    for i in range(N_ALPHA_MATCHES):
        home = int(rng_a.integers(1, N_SHARED_TEAMS + 1))
        away = int(rng_a.integers(1, N_SHARED_TEAMS + 1))
        while away == home:
            away = int(rng_a.integers(1, N_SHARED_TEAMS + 1))
        season = int(rng_a.integers(1, sid))
        comp = ((season - 1) // 3 % N_ALPHA_COMPS) + 1
        d = base + timedelta(days=int(rng_a.integers(0, 700)))
        am.append((i + 1, home, away, season, comp, d))
    for i in range(N_SHARED_MATCHES):
        mid, home, away, season, comp, d = am[i]
        jitter = int(rng_b.integers(0, 3)) - 1  # -1, 0, +1 day
        bm.append(
            (
                1000 + i,
                shared_team_map[home],
                shared_team_map[away],
                300 + season,
                201 + (comp - 1) % N_BETA_COMPS,
                d + timedelta(days=jitter),
            )
        )
    for i in range(N_BETA_MATCHES - N_SHARED_MATCHES):
        home = 101 + int(rng_b.integers(0, N_BETA_TEAMS))
        away = 101 + int(rng_b.integers(0, N_BETA_TEAMS))
        season = 300 + int(rng_b.integers(1, sid))
        comp = 201 + int(rng_b.integers(0, N_BETA_COMPS))
        d = base + timedelta(days=int(rng_b.integers(0, 700)))
        bm.append((2000 + i, home, away, season, comp, d))

    alpha_matches = pa.table(
        {
            "match_id": pa.array([r[0] for r in am], type=pa.int64()),
            "home_team_id": pa.array([r[1] for r in am], type=pa.int64()),
            "away_team_id": pa.array([r[2] for r in am], type=pa.int64()),
            "season_id": pa.array([r[3] for r in am], type=pa.int64()),
            "competition_id": pa.array([r[4] for r in am], type=pa.int64()),
            "match_date": pa.array([r[5] for r in am], type=pa.date32()),
        }
    )
    beta_matches = pa.table(
        {
            "id": pa.array([r[0] for r in bm], type=pa.int64()),
            "home_team_id": pa.array([r[1] for r in bm], type=pa.int64()),
            "away_team_id": pa.array([r[2] for r in bm], type=pa.int64()),
            "season_id": pa.array([r[3] for r in bm], type=pa.int64()),
            "competition_id": pa.array([r[4] for r in bm], type=pa.int64()),
            "match_date": pa.array([r[5] for r in bm], type=pa.date32()),
        }
    )

    return {
        "alpha": {
            "teams": alpha_teams,
            "competitions": alpha_comps,
            "seasons": alpha_seasons,
            "players": alpha_players,
            "matches": alpha_matches,
        },
        "beta": {
            "teams": beta_teams,
            "competitions": beta_comps,
            "seasons": beta_seasons,
            "players": beta_players,
            "matches": beta_matches,
        },
    }
