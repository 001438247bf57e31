"""Relational two-source ER — the reference's five entity-type pipeline
(teams, competitions, seasons, players, matches) re-expressed Ray-Data-first.

Semantics preserved exactly (SURVEY.md §2.3):
- teams:        argmax over token_sort_ratio(normalize_name(alias(·)));
                threshold TEAM_SIM_THRESHOLD=0.7  (matchers/teams_matcher.py:36-60)
- competitions: argmax over token_sort_ratio(normalize_competition(·));
                threshold 0.75                    (matchers/competitions_matcher.py:27-51)
- seasons:      equi-join on the competition map; ALL qualifying pairs
                (n:m, no argmax); year-delta confidence 1.0/0.7/0.0;
                threshold 0.6                     (matchers/seasons_matcher.py:19-50)
- players:      0.6*name + 0.3*dob + 0.1*team; argmax; threshold 0.85
                                                  (matchers/players_matcher.py:36-89)
- matches:      triple equi-join (comp, season, home/away team alignment);
                0.4 + 0.3*date_sim + 0.3; argmax; threshold 0.6
                                                  (matchers/matches_matcher.py:26-76)
- argmax tie-break: strict ``>`` over beta rows in original order (first
  max wins) — reproduced with ``np.argmax`` over beta-ordered score arrays.

Physical design: the BETA side of each matcher is dimension-sized (teams /
competitions / seasons) or bounded (players), so it is broadcast once
(``ray.put``) and every ALPHA batch scores against it inside ``map_batches``
— the idiomatic broadcast cross-score. For web-scale symmetric inputs use
the blocking pages pipeline (pipelines/pages_er.py) instead; these matchers
are the reference-parity surface.

Routing runs through state/router.route_matches (three-way gate, optional
validator, circuit breaker); mergers apply the reference survivorship rules
and emit UES entity tables + the exploded source_lineage table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from entity_resolution_engine_ray.config import Thresholds, ValidationConfig
from entity_resolution_engine_ray.functions.ids import build_lineage, generate_ues_id
from entity_resolution_engine_ray.functions.scoring import (
    date_similarity_days,
    player_confidence,
    season_year_confidence,
)
from entity_resolution_engine_ray.functions.textnorm import (
    apply_team_alias,
    normalize_competition,
    normalize_country,
    normalize_name,
    normalize_season,
)
from entity_resolution_engine_ray.state.router import RoutingOutcome, route_matches


def _to_ds(t) -> rd.Dataset:
    return t if isinstance(t, rd.Dataset) else rd.from_arrow(t)


def _sorted_form(norm: str) -> str:
    """token_sort_ratio(a, b) == indel_ratio over whitespace-sorted tokens —
    pre-sorting each side once replaces the per-pair re-sort."""
    return " ".join(sorted(norm.split()))


def _score_against_sorted(
    sa: str, beta_sorted: list[str], beta_lens: np.ndarray, threshold: float
) -> np.ndarray:
    """Vectorized lossless bound-prune (players-matcher scheme,
    relational_er.match_players): indel ≤ 2·min(|a|,|b|)/(|a|+|b|), so rows
    whose bound can't reach ``threshold`` keep the bound (strictly below any
    emittable real score — argmax and emission are provably unchanged)."""
    from entity_resolution_engine_ray.functions.similarity import indel_ratio

    la = float(len(sa))
    if la == 0.0:
        return np.zeros(len(beta_sorted), dtype=np.float64)
    ub = np.minimum(1.0, 2.0 * np.minimum(la, beta_lens) / np.maximum(la + beta_lens, 1.0))
    ub[beta_lens == 0] = 0.0  # empty side scores 0 (token_sort_ratio guard)
    scores = ub.copy()
    for j in np.flatnonzero(ub >= threshold):
        scores[j] = indel_ratio(sa, beta_sorted[j]) if beta_sorted[j] else 0.0
    return scores


# ---------------------------------------------------------------- teams


def match_teams(alpha_teams, beta_teams, threshold: float | None = None) -> list[dict]:
    th = threshold if threshold is not None else Thresholds().team_sim_threshold
    beta_tbl = beta_teams if isinstance(beta_teams, pa.Table) else beta_teams.to_arrow()
    beta_ids = beta_tbl["id"].to_pylist()
    beta_sorted = [
        _sorted_form(normalize_name(apply_team_alias(n)))
        for n in beta_tbl["display_name"].to_pylist()
    ]
    beta_lens = np.asarray([len(b) for b in beta_sorted], dtype=np.float64)
    beta_regions = beta_tbl["region"].to_pylist()
    beta_ref = ray.put((beta_ids, beta_sorted, beta_lens, beta_regions))

    def score_batch(t: pa.Table) -> pa.Table:
        b_ids, b_sorted, b_lens, b_regions = ray.get(beta_ref)
        rows = {"alpha_team_id": [], "beta_team_id": [], "confidence": [], "name": [], "country": []}
        names = t["name"].to_pylist()
        countries = t["country"].to_pylist()
        ids = t["team_id"].to_pylist()
        for i, name in enumerate(names):
            scores = _score_against_sorted(
                _sorted_form(normalize_name(apply_team_alias(name))), b_sorted, b_lens, th
            )
            j = int(np.argmax(scores)) if len(scores) else -1
            if j >= 0 and scores[j] >= th and scores[j] > 0.0:
                rows["alpha_team_id"].append(ids[i])
                rows["beta_team_id"].append(b_ids[j])
                rows["confidence"].append(float(scores[j]))
                rows["name"].append(name)
                rows["country"].append(countries[i] or b_regions[j])
        return pa.table(
            {
                "alpha_team_id": pa.array(rows["alpha_team_id"], type=pa.int64()),
                "beta_team_id": pa.array(rows["beta_team_id"], type=pa.int64()),
                "confidence": pa.array(rows["confidence"], type=pa.float64()),
                "name": pa.array(rows["name"], type=pa.string()),
                "country": pa.array(rows["country"], type=pa.string()),
            }
        )

    out = _to_ds(alpha_teams).map_batches(score_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values("alpha_team_id").to_dict("records")


# ---------------------------------------------------------------- competitions


def match_competitions(alpha_comps, beta_comps, threshold: float | None = None) -> list[dict]:
    th = threshold if threshold is not None else Thresholds().comp_sim_threshold
    beta_tbl = beta_comps if isinstance(beta_comps, pa.Table) else beta_comps.to_arrow()
    beta_ids = beta_tbl["id"].to_pylist()
    beta_sorted = [_sorted_form(normalize_competition(x)) for x in beta_tbl["title"].to_pylist()]
    beta_lens = np.asarray([len(b) for b in beta_sorted], dtype=np.float64)
    beta_locales = beta_tbl["locale"].to_pylist()
    beta_ref = ray.put((beta_ids, beta_sorted, beta_lens, beta_locales))

    def score_batch(t: pa.Table) -> pa.Table:
        b_ids, b_sorted, b_lens, b_locales = ray.get(beta_ref)
        rows = {"alpha_competition_id": [], "beta_competition_id": [], "confidence": [], "name": [], "country": []}
        for cid, name, country in zip(
            t["competition_id"].to_pylist(), t["name"].to_pylist(), t["country"].to_pylist()
        ):
            scores = _score_against_sorted(_sorted_form(normalize_competition(name)), b_sorted, b_lens, th)
            j = int(np.argmax(scores)) if len(scores) else -1
            if j >= 0 and scores[j] >= th and scores[j] > 0.0:
                rows["alpha_competition_id"].append(cid)
                rows["beta_competition_id"].append(b_ids[j])
                rows["confidence"].append(float(scores[j]))
                rows["name"].append(name)
                rows["country"].append(normalize_country(country or b_locales[j]))
        return pa.table(
            {
                "alpha_competition_id": pa.array(rows["alpha_competition_id"], type=pa.int64()),
                "beta_competition_id": pa.array(rows["beta_competition_id"], type=pa.int64()),
                "confidence": pa.array(rows["confidence"], type=pa.float64()),
                "name": pa.array(rows["name"], type=pa.string()),
                "country": pa.array(rows["country"], type=pa.string()),
            }
        )

    out = _to_ds(alpha_comps).map_batches(score_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values("alpha_competition_id").to_dict("records")


# ---------------------------------------------------------------- seasons


def match_seasons(alpha_seasons, beta_seasons, competition_map: dict, threshold: float = 0.6) -> list[dict]:
    """n:m — ALL qualifying pairs under the competition equi-join."""
    a = (alpha_seasons if isinstance(alpha_seasons, pa.Table) else alpha_seasons.to_arrow()).to_pandas()
    b = (beta_seasons if isinstance(beta_seasons, pa.Table) else beta_seasons.to_arrow()).to_pandas()
    a["norm"] = a["name"].map(normalize_season)
    b["norm"] = b["label"].map(normalize_season)
    a["bcomp"] = a["competition_id"].map(lambda c: competition_map.get(c))
    a = a.dropna(subset=["bcomp"])
    if a.empty:
        return []
    a["bcomp"] = a["bcomp"].astype(np.int64)
    merged = a.merge(b, left_on="bcomp", right_on="competition_id", suffixes=("_a", "_b"))
    results = []
    for r in merged.itertuples():
        a_start, a_end = r.norm_a
        b_start, b_end = r.norm_b
        conf = season_year_confidence(np.array([a_start or np.nan]), np.array([b_start or np.nan]))[0]
        if conf >= threshold:
            results.append(
                {
                    "alpha_season_id": int(r.season_id),
                    "beta_season_id": int(r.id),
                    "confidence": float(conf),
                    "start_year": a_start or b_start,
                    "end_year": a_end or b_end,
                    "alpha_competition_id": int(r.competition_id_a),
                    "beta_competition_id": int(r.competition_id_b),
                }
            )
    results.sort(key=lambda m: (m["alpha_season_id"], m["beta_season_id"]))
    return results


# ---------------------------------------------------------------- players


def match_players(
    alpha_players, beta_players, team_map: dict, beta_teams, threshold: float | None = None
) -> list[dict]:
    th = threshold if threshold is not None else Thresholds().confidence_autopass
    beta_tbl = beta_players if isinstance(beta_players, pa.Table) else beta_players.to_arrow()
    bteams = beta_teams if isinstance(beta_teams, pa.Table) else beta_teams.to_arrow()
    beta_team_lookup = {
        normalize_name(n): i for n, i in zip(bteams["display_name"].to_pylist(), bteams["id"].to_pylist())
    }
    b_ids = beta_tbl["id"].to_pylist()
    # pre-sorted token form: token_sort_ratio(a, b) == indel_ratio over
    # whitespace-sorted tokens — sort each side ONCE instead of per pair
    b_sorted = [
        " ".join(sorted(normalize_name(n).split())) for n in beta_tbl["full_name"].to_pylist()
    ]
    b_lens = np.asarray([len(s) for s in b_sorted], dtype=np.float64)
    b_years = np.asarray(beta_tbl["birth_year"].to_pylist(), dtype=np.float64)
    b_team_ids = np.asarray(
        [beta_team_lookup.get(normalize_name(tn)) or 0 for tn in beta_tbl["team_name"].to_pylist()],
        dtype=np.int64,
    )
    beta_ref = ray.put((b_ids, b_sorted, b_lens, b_years, b_team_ids))
    team_map_ref = ray.put(dict(team_map))

    def score_batch(t: pa.Table) -> pa.Table:
        from entity_resolution_engine_ray.functions.similarity import indel_ratio

        ids_, sorted_, lens_, years_, bteam_ = ray.get(beta_ref)
        tmap = ray.get(team_map_ref)
        out = {"alpha_player_id": [], "beta_player_id": [], "confidence": [],
               "name_similarity": [], "dob_similarity": [], "team_similarity": []}
        dobs = t["dob"].to_pylist()
        for pid, name, dob, team_id in zip(
            t["player_id"].to_pylist(), t["name"].to_pylist(), dobs, t["team_id"].to_pylist()
        ):
            sa = " ".join(sorted(normalize_name(name).split()))
            la = float(len(sa))
            a_year = float(dob.year) if dob is not None else np.nan
            dob_scores = np.where(
                np.isnan(years_) | np.isnan(a_year),
                0.0,
                np.where(years_ == a_year, 1.0, np.where(np.abs(years_ - a_year) == 1, 0.6, 0.0)),
            )
            mapped = tmap.get(team_id)
            team_scores = ((bteam_ != 0) & (bteam_ == (mapped or -1))).astype(np.float64)
            # LOSSLESS prune: indel ratio ≤ 2·min(|a|,|b|)/(|a|+|b|), so
            # conf ≤ 0.6·bound + 0.3·dob + 0.1·team. Pairs whose bound
            # cannot reach the emission threshold are skipped entirely —
            # their conf upper bound stands in for argmax bookkeeping (they
            # can never be emitted, so the output is provably unchanged).
            ratio_ub = np.minimum(1.0, 2.0 * np.minimum(la, lens_) / np.maximum(la + lens_, 1.0))
            conf_ub = player_confidence(ratio_ub, dob_scores, team_scores)
            name_scores = np.zeros(len(sorted_), dtype=np.float64)
            cand = np.flatnonzero(conf_ub >= th)
            for j in cand:
                if sa and sorted_[j]:
                    name_scores[j] = indel_ratio(sa, sorted_[j])
            conf = player_confidence(name_scores, dob_scores, team_scores)
            conf = np.where(conf_ub >= th, conf, conf_ub)  # pruned keep their bound
            j = int(np.argmax(conf))
            if conf[j] > 0.0 and conf[j] >= th:
                out["alpha_player_id"].append(pid)
                out["beta_player_id"].append(ids_[j])
                out["confidence"].append(float(conf[j]))
                out["name_similarity"].append(float(name_scores[j]))
                out["dob_similarity"].append(float(dob_scores[j]))
                out["team_similarity"].append(float(team_scores[j]))
        return pa.table(
            {
                "alpha_player_id": pa.array(out["alpha_player_id"], type=pa.int64()),
                "beta_player_id": pa.array(out["beta_player_id"], type=pa.int64()),
                "confidence": pa.array(out["confidence"], type=pa.float64()),
                "name_similarity": pa.array(out["name_similarity"], type=pa.float64()),
                "dob_similarity": pa.array(out["dob_similarity"], type=pa.float64()),
                "team_similarity": pa.array(out["team_similarity"], type=pa.float64()),
            }
        )

    out = _to_ds(alpha_players).map_batches(score_batch, batch_format="pyarrow", batch_size=256).to_pandas()
    if out.empty:  # .apply on an empty frame yields a frame, not a column
        return []
    out["breakdown"] = out.apply(
        lambda r: {
            "name_similarity": r["name_similarity"],
            "dob_similarity": r["dob_similarity"],
            "team_similarity": r["team_similarity"],
        },
        axis=1,
    )
    out = out.drop(columns=["name_similarity", "dob_similarity", "team_similarity"])
    return out.sort_values("alpha_player_id").to_dict("records")


# ---------------------------------------------------------------- matches


def match_matches(
    alpha_matches, beta_matches, alpha_team_map: dict, competition_map: dict, season_map: dict,
    threshold: float | None = None,
) -> list[dict]:
    th = threshold if threshold is not None else Thresholds().confidence_review
    a = (alpha_matches if isinstance(alpha_matches, pa.Table) else alpha_matches.to_arrow()).to_pandas()
    b = (beta_matches if isinstance(beta_matches, pa.Table) else beta_matches.to_arrow()).to_pandas()
    b = b.reset_index().rename(columns={"index": "beta_order"})
    a["bcomp"] = a["competition_id"].map(lambda c: competition_map.get(c))
    a["bseason"] = a["season_id"].map(lambda s: season_map.get(s))
    a["bhome"] = a["home_team_id"].map(lambda t: alpha_team_map.get(t))
    a["baway"] = a["away_team_id"].map(lambda t: alpha_team_map.get(t))
    a = a.dropna(subset=["bcomp", "bseason", "bhome", "baway"])
    if a.empty:
        return []
    for c in ("bcomp", "bseason", "bhome", "baway"):
        a[c] = a[c].astype(np.int64)
    merged = a.merge(
        b,
        left_on=["bcomp", "bseason", "bhome", "baway"],
        right_on=["competition_id", "season_id", "home_team_id", "away_team_id"],
        suffixes=("_a", "_b"),
    )
    if merged.empty:
        return []
    delta = (
        pd.to_datetime(merged["match_date_a"]) - pd.to_datetime(merged["match_date_b"])
    ).dt.days.to_numpy(dtype=np.float64)
    date_sim = date_similarity_days(delta)
    merged["confidence"] = 0.4 * 1.0 + 0.3 * date_sim + 0.3
    merged = merged.sort_values(
        ["match_id", "confidence", "beta_order"], ascending=[True, False, True], kind="mergesort"
    ).drop_duplicates("match_id", keep="first")
    merged = merged[merged["confidence"] >= th]
    return [
        {"alpha_match_id": int(r.match_id), "beta_match_id": int(r.id), "confidence": float(r.confidence)}
        for r in merged.itertuples()
    ]


# ---------------------------------------------------------------- mergers


def merge_teams(matches: list[dict], alpha_teams: pa.Table, beta_teams: pa.Table):
    a = {r["team_id"]: r for r in alpha_teams.to_pylist()}
    b = {r["id"]: r for r in beta_teams.to_pylist()}
    records, alpha_map, beta_map = [], {}, {}
    for m in matches:
        ar, br = a.get(m["alpha_team_id"]), b.get(m["beta_team_id"])
        if ar is None and br is None:
            continue
        ues = generate_ues_id("UEST", m["alpha_team_id"], m["beta_team_id"])
        records.append(
            {
                "ues_team_id": ues,
                "name": ar["name"] if ar else (br or {}).get("display_name"),
                "country": ar.get("country") if ar else (br or {}).get("region"),
                "merge_confidence": m["confidence"],
                "lineage": build_lineage("team", m["alpha_team_id"], m["beta_team_id"], m["confidence"], {"name_similarity": m["confidence"]}),
            }
        )
        alpha_map[m["alpha_team_id"]] = ues
        beta_map[m["beta_team_id"]] = ues
    return records, alpha_map, beta_map


def build_competition_entities(matches: list[dict]):
    records, alpha_map, beta_map = [], {}, {}
    for m in matches:
        ues = generate_ues_id("UESC", m["alpha_competition_id"], m["beta_competition_id"])
        records.append(
            {
                "ues_competition_id": ues,
                "name": m["name"],
                "country": m.get("country"),
                "merge_confidence": m["confidence"],
                "lineage": build_lineage("competition", m["alpha_competition_id"], m["beta_competition_id"], m["confidence"], {"name_similarity": m["confidence"]}),
            }
        )
        alpha_map[m["alpha_competition_id"]] = ues
        beta_map[m["beta_competition_id"]] = ues
    return records, alpha_map, beta_map


def build_season_entities(matches: list[dict], competition_ues_map: dict):
    """FK remap with alpha-first then beta fallback (reference
    matchers/seasons_matcher.py:76-82)."""
    records, alpha_map, beta_map = [], {}, {}
    for m in matches:
        ues = generate_ues_id("UESS", m["alpha_season_id"], m["beta_season_id"])
        comp_ues = competition_ues_map.get(m.get("alpha_competition_id"))
        if comp_ues is None and m.get("beta_competition_id") is not None:
            comp_ues = competition_ues_map.get(m.get("beta_competition_id"))
        records.append(
            {
                "ues_season_id": ues,
                "start_year": m.get("start_year"),
                "end_year": m.get("end_year"),
                "competition_ues_id": comp_ues,
                "merge_confidence": m["confidence"],
                "lineage": build_lineage("season", m["alpha_season_id"], m["beta_season_id"], m["confidence"], {"start_year": m.get("start_year"), "end_year": m.get("end_year")}),
            }
        )
        alpha_map[m["alpha_season_id"]] = ues
        beta_map[m["beta_season_id"]] = ues
    return records, alpha_map, beta_map


def merge_players(matches: list[dict], alpha_players: pa.Table, beta_players: pa.Table, team_ues_map: dict):
    a = {r["player_id"]: r for r in alpha_players.to_pylist()}
    b = {r["id"]: r for r in beta_players.to_pylist()}
    records, alpha_map, beta_map = [], {}, {}
    for m in matches:
        ar, br = a.get(m["alpha_player_id"]), b.get(m["beta_player_id"])
        if ar is None or br is None:
            continue
        ues = generate_ues_id("UESP", m["alpha_player_id"], m["beta_player_id"])
        foot = br.get("footedness") or ar.get("foot")
        records.append(
            {
                "ues_player_id": ues,
                "canonical_name": ar.get("name") or br.get("full_name"),
                "dob": ar.get("dob"),
                "birth_year": br.get("birth_year"),
                "nationality": normalize_country(ar.get("nationality") or br.get("nationality")),
                "height_cm": ar.get("height_cm") or br.get("height_cm"),
                "foot": foot.lower() if isinstance(foot, str) else foot,
                "team_ues_id": team_ues_map.get(ar.get("team_id")),
                "merge_confidence": m["confidence"],
                "lineage": build_lineage("player", m["alpha_player_id"], m["beta_player_id"], m["confidence"], m.get("breakdown", {})),
            }
        )
        alpha_map[m["alpha_player_id"]] = ues
        beta_map[m["beta_player_id"]] = ues
    return records, alpha_map, beta_map


def merge_matches(matches: list[dict], alpha_matches: pa.Table, team_ues_map: dict, comp_ues_map: dict, season_ues_map: dict):
    a = {r["match_id"]: r for r in alpha_matches.to_pylist()}
    records = []
    for m in matches:
        ar = a.get(m["alpha_match_id"])
        if ar is None:
            continue
        records.append(
            {
                "ues_match_id": generate_ues_id("UESM", m["alpha_match_id"], m["beta_match_id"]),
                "home_team_ues_id": team_ues_map.get(ar.get("home_team_id")),
                "away_team_ues_id": team_ues_map.get(ar.get("away_team_id")),
                "season_ues_id": season_ues_map.get(ar.get("season_id")),
                "competition_ues_id": comp_ues_map.get(ar.get("competition_id")),
                "match_date": ar.get("match_date"),
                "merge_confidence": m["confidence"],
                "lineage": build_lineage("match", m["alpha_match_id"], m["beta_match_id"], m["confidence"], {"team": m["confidence"]}),
            }
        )
    return records


def explode_source_lineage(records: list[dict], entity_type: str, id_key: str) -> list[dict]:
    """The reference's source_lineage explode (ues_writer/writer.py:56-67)."""
    out = []
    for rec in records:
        for src in rec["lineage"]["sources"]:
            out.append(
                {
                    "source_system": src["source"],
                    "source_id": src["id"],
                    "ues_entity_type": entity_type,
                    "ues_entity_id": rec[id_key],
                }
            )
    return out


# ---------------------------------------------------------------- lifecycle


def run_relational_er(
    alpha: dict[str, pa.Table],
    beta: dict[str, pa.Table],
    validation_config: ValidationConfig | None = None,
    validator=None,
) -> dict:
    """The reference cli/run_mapping.py:37-188 lifecycle: five sequential
    match → route → merge stages with cross-stage maps."""
    from entity_resolution_engine_ray.state.adapters import (
        attach_competition_conflicts,
        attach_match_conflicts,
        attach_player_conflicts,
        attach_season_conflicts,
        attach_team_conflicts,
    )

    vcfg = validation_config or ValidationConfig()
    outcomes: dict[str, RoutingOutcome] = {}

    team_matches = attach_team_conflicts(
        match_teams(alpha["teams"], beta["teams"]), alpha["teams"], beta["teams"]
    )
    outcomes["team"] = route_matches("team", team_matches, vcfg, validator)
    team_entities, alpha_team_to_ues, _ = merge_teams(outcomes["team"].approved, alpha["teams"], beta["teams"])
    alpha_team_to_beta = {m["alpha_team_id"]: m["beta_team_id"] for m in outcomes["team"].approved}

    comp_matches = attach_competition_conflicts(
        match_competitions(alpha["competitions"], beta["competitions"]),
        alpha["competitions"],
        beta["competitions"],
    )
    outcomes["competition"] = route_matches("competition", comp_matches, vcfg, validator)
    comp_entities, alpha_comp_to_ues, beta_comp_to_ues = build_competition_entities(outcomes["competition"].approved)
    comp_map = {m["alpha_competition_id"]: m["beta_competition_id"] for m in outcomes["competition"].approved}

    season_matches = attach_season_conflicts(
        match_seasons(alpha["seasons"], beta["seasons"], comp_map), alpha["seasons"], beta["seasons"]
    )
    outcomes["season"] = route_matches("season", season_matches, vcfg, validator)
    season_entities, alpha_season_to_ues, _ = build_season_entities(outcomes["season"].approved, alpha_comp_to_ues)
    season_map = {m["alpha_season_id"]: m["beta_season_id"] for m in outcomes["season"].approved}

    player_matches = attach_player_conflicts(
        match_players(alpha["players"], beta["players"], alpha_team_to_beta, beta["teams"]),
        alpha["players"],
        beta["players"],
    )
    outcomes["player"] = route_matches("player", player_matches, vcfg, validator)
    player_entities, _, _ = merge_players(outcomes["player"].approved, alpha["players"], beta["players"], alpha_team_to_ues)

    match_matches_list = attach_match_conflicts(
        match_matches(alpha["matches"], beta["matches"], alpha_team_to_beta, comp_map, season_map),
        alpha["matches"],
        beta["matches"],
    )
    outcomes["match"] = route_matches("match", match_matches_list, vcfg, validator)
    match_entities = merge_matches(outcomes["match"].approved, alpha["matches"], alpha_team_to_ues, alpha_comp_to_ues, alpha_season_to_ues)

    source_lineage = (
        explode_source_lineage(team_entities, "team", "ues_team_id")
        + explode_source_lineage(comp_entities, "competition", "ues_competition_id")
        + explode_source_lineage(season_entities, "season", "ues_season_id")
        + explode_source_lineage(player_entities, "player", "ues_player_id")
        + explode_source_lineage(match_entities, "match", "ues_match_id")
    )
    return {
        "entities": {
            "teams": team_entities,
            "competitions": comp_entities,
            "seasons": season_entities,
            "players": player_entities,
            "matches": match_entities,
        },
        "source_lineage": source_lineage,
        "outcomes": outcomes,
        "metrics": [o.metrics for o in outcomes.values()],
    }
