"""Relational operator building blocks."""

from de_final_project_spark.operators.dedup import keep_latest  # noqa: F401
from de_final_project_spark.operators.surrogate import add_sequence_key  # noqa: F401
