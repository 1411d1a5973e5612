"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: end-to-end crawl over the synthetic corpus (the
    engine's own input domain) PLUS a documents-table span pipeline over
    sf0.001 — returns the interleaved span documents (input_hint shape).
    Driver checks rows >= 0 and a stable schema."""
    from goto_eater_crawler_ray.pipelines.queries import q_doc_spans

    return q_doc_spans("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2 +
    training-data ops). Each callable takes sf_dir and returns a Dataset /
    DataFrame / pyarrow Table."""
    from goto_eater_crawler_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (same column names).
    Probabilistic / stateful / nested-output ops are intentionally absent
    -> the driver records its weaker rows-only check for those."""
    from goto_eater_crawler_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
