"""Composed dataflows: the 11 star-schema table builders and the
incremental rebuild DAG (the reference's correctness surface, SURVEY.md
§2.12), plus the analytics extension queries."""

from de_final_project_spark.plans.dims import (  # noqa: F401
    make_dim_counterparty,
    make_dim_currency,
    make_dim_date,
    make_dim_design,
    make_dim_location,
    make_dim_payment_type,
    make_dim_staff,
    make_dim_transaction,
)
from de_final_project_spark.plans.facts import (  # noqa: F401
    make_fact_payment,
    make_fact_purchase_order,
    make_fact_sales_order,
)
