"""Merged query/oracle registry consumed by __spark_entry__.py."""

from __future__ import annotations

from . import (
    advanced_queries,
    engine_queries,
    multimodal_queries,
    relational_queries,
    timeseries_queries,
)

_MODULES = [
    engine_queries,
    relational_queries,
    advanced_queries,
    timeseries_queries,
    multimodal_queries,
]

try:  # pass-2 modules may land later / be optional
    from . import text_queries

    _MODULES.append(text_queries)
except ImportError:  # pragma: no cover
    pass


def all_queries() -> dict:
    out: dict = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracle_sql() -> dict:
    out: dict = {}
    for m in _MODULES:
        out.update(m.ORACLE_SQL)
    return out
