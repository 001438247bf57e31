"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library code these functions use) calls ``ray.init()`` /
``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pages-ER pipeline on a deterministic synthetic fixture sized
    for the sf0.001 smoke tier; returns the entities Dataset."""
    from entity_resolution_engine_ray.pipelines.pages_er import run_pages_er
    from entity_resolution_engine_ray.sources.pages import write_pages_fixture

    fix = write_pages_fixture("/tmp/er_fixture_entry", 1000, seed=42)
    res = run_pages_er(fix["pages"], "/tmp/er_entry_out")
    return res["entities"].select_columns(
        ["entity_id", "canonical_url", "domain", "lang", "n_members"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 and the
    training-data-pipeline operator set (dedup / similarity search / text
    analysis / windows / joins / argmax / top-k / flagship ER)."""
    from entity_resolution_engine_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (column names/dtypes match exactly);
    sketch/heuristic/ER queries are intentionally absent → rows-only check."""
    from entity_resolution_engine_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
