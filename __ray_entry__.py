"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in pdf_parser_ray) calls ray.init/ray.shutdown.

- ``entry()``      : flagship extraction pipeline on sf0.001.
- ``queries()``    : one entry per implemented operator/pipeline
                     (SURVEY.md §2 + the training-data operator suite).
- ``oracle_sql()`` : DuckDB-equivalent SQL for the SQL-expressible
                     subset; extraction/LSH/markdown ops are verified by
                     the pytest oracle suite instead (rows-only here).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents ->
    transcripts -> per-turn extraction, stable (conv_id, turn_idx)
    order."""
    from pdf_parser_ray.pipelines.extraction import run_extraction
    return run_extraction("/root/testdata/sf0.001", ordered=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_parser_ray.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pdf_parser_ray.queries import ORACLES
    return dict(ORACLES)
