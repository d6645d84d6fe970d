"""Query-plan registry: every operator from SURVEY.md §2 (and the
LLM-data extensions) as a named, oracle-paired query.

Importing this package loads all query modules, which self-register
into ``registry.REGISTRY``.
"""

from martian_moments_spark.plans import registry  # noqa: F401
from martian_moments_spark.plans.registry import REGISTRY, QuerySpec, register  # noqa: F401


def load_all() -> dict:
    """Import every query module (side effect: registration)."""
    from martian_moments_spark.plans import (  # noqa: F401
        queries_relational,
        queries_nested,
        queries_functions,
        queries_events,
        queries_incremental,
        queries_llm,
        queries_curation,
        queries_analytics,
        queries_operators,
        queries_quality,
        queries_streaming,
        queries_tpch,
    )

    return REGISTRY
