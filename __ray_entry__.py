"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/ray.shutdown() happens here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full validation of a deterministic synthetic
    web-page corpus (BASELINE.json input_hint shape) at sf0.001 scale,
    plus a sanity read of the driver testdata. Returns the one-row
    validation summary (rows >= 0, stable schema)."""
    from patito_ray.generate import ray_webpages
    from patito_ray.pipelines.webpage import summary_table, validate_webpages

    ds = ray_webpages(2000, blocks=4)
    summary = validate_webpages(ds)
    return summary_table(summary)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from patito_ray.pipelines.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from patito_ray.pipelines.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
