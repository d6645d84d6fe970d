"""Medallion pipelines + the gap-detection feedback loop — the
reference's orchestration semantics (flatten → star → marts →
validate → schedule) without its Airflow/Kafka plumbing.
"""

from martian_moments_spark.pipelines.feedback import (  # noqa: F401
    detect_gaps,
    feedback_rounds,
    schedule_envelope,
)
