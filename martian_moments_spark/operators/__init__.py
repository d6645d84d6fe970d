"""Composable relational operator library (SURVEY.md §2.2-§2.7 +
custom joins Spark lacks as primitives).

Plain DataFrame→DataFrame functions — each is the engine-named form of
an operator the reference expresses in Snowflake SQL, plus the two
custom join algorithms (as-of, bucketized range) built as compositions
of built-ins so Catalyst still owns the physical plan.
"""

from martian_moments_spark.operators.relational import (  # noqa: F401
    anti_join_gaps,
    asof_join,
    broadcast_dim_join,
    bucketed_range_join,
    case_map,
    high_watermark_filter,
    topk_per_group,
)
