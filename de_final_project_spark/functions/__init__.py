"""Column-expression helpers. Built-ins only on the parity surface —
no Python UDFs, so every expression stays inside whole-stage codegen."""

from de_final_project_spark.functions.datetime import (  # noqa: F401
    date_parts,
    day_of_week_monday0,
    time_string,
)
