"""Date/time column expressions (F1-F9 of SURVEY.md §2.9).

Semantic traps reproduced deliberately (SURVEY.md §7.4 risk 2):

- day_of_week is pandas' ``dt.day_of_week`` — Monday=0..Sunday=6. Spark's
  ``dayofweek`` is Sunday=1, so we shift: ``(dayofweek + 5) % 7``.
- time-of-day travels as a STRING ``HH:MM:SS.ffffff`` (6-digit micros),
  matching pandas ``strftime('%H:%M:%S.%f')`` (reference
  src/process_lambda.py:251,254,310,313,377,380); Spark has no TimeType.
- day/month names are English full names ("Monday", "January"), matching
  pandas ``dt.day_name()/month_name()`` (reference :235-236).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def day_of_week_monday0(date_col: Column | str) -> Column:
    """pandas dt.day_of_week semantics: Monday=0 .. Sunday=6."""
    return ((F.dayofweek(date_col) + F.lit(5)) % 7).cast("int")


def time_string(ts_col: Column | str) -> Column:
    """HH:MM:SS.ffffff time-of-day string, microsecond precision."""
    return F.date_format(ts_col, "HH:mm:ss.SSSSSS")


def date_parts(date_col: Column | str) -> dict[str, Column]:
    """The 7 derived date-part columns of dim_date (reference
    src/process_lambda.py:231-237)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return {
        "year": F.year(c).cast("long"),
        "month": F.month(c).cast("long"),
        "day": F.dayofmonth(c).cast("long"),
        "day_of_week": day_of_week_monday0(c).cast("long"),
        "day_name": F.date_format(c, "EEEE"),
        "month_name": F.date_format(c, "MMMM"),
        "quarter": F.quarter(c).cast("long"),
    }
