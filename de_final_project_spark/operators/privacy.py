"""Privacy transformations for sharing data outside its trust boundary.

The reference ships raw counterparty / staff PII straight into its
warehouse (src/process_lambda.py builds dim_staff with names and email
addresses); any real deployment needs the governance pass between the
lake and a consumer: deterministic pseudonymization (joinable tokens
instead of identifiers), masking (human-readable but non-identifying),
and generalization (bucketed quasi-identifiers for k-anonymity-style
release).

All transforms are pure column expressions — narrow projection, no
shuffle, applied at read or publish time. Tokens are salted md5: stable
across runs and tables (joins still work on the token), not reversible
without the salt, and bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_final_project_spark.sources.readers import read_testdata

TOKEN_SALT = "grafted-pepper-v1"  # rotate to re-key the token space
ACCTBAL_BUCKET = 500  # generalization width for the balance column


def pseudonymize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-ready customer table: key tokenized (salted md5 prefix,
    still joinable), name masked to a salted-HASH suffix, account
    balance generalized to ACCTBAL_BUCKET-wide bands (floor semantics,
    negative-safe), segment and nation kept as coarse attributes. One
    row per customer; the oracle restates every transform exactly.

    The mask deliberately publishes NO real characters of the name:
    trailing-character masks leak structured suffixes (TPC-H names end
    in the customer key, so 'last 3 chars' would publish custkey mod
    1000 next to nation/segment/balance — enough to re-identify;
    ADVICE r5). A 4-hex salted-hash suffix keeps rows visually
    distinguishable for humans without being reversible, and is
    length-safe for names shorter than any fixed substring."""
    cust = read_testdata(spark, sf_dir, "customer")
    token = F.substring(
        F.md5(F.concat(F.lit(TOKEN_SALT + "|"), F.col("c_custkey").cast("string"))),
        1,
        16,
    )
    masked_name = F.concat(
        F.lit("***"),
        F.substring(
            F.md5(F.concat(F.lit(TOKEN_SALT + "|name|"), F.col("c_name"))), 1, 4
        ),
    )
    band_lo = (
        F.floor(F.col("c_acctbal") / ACCTBAL_BUCKET).cast("long")
        * ACCTBAL_BUCKET
    )
    return cust.select(
        token.alias("customer_token"),
        masked_name.alias("name_masked"),
        F.col("c_nationkey").alias("nation_key"),
        band_lo.alias("acctbal_band_lo"),
        (band_lo + ACCTBAL_BUCKET).alias("acctbal_band_hi"),
        F.col("c_mktsegment").alias("segment"),
    )


PSEUDONYMIZE_CUSTOMERS_SQL = f"""
SELECT substr(md5('{TOKEN_SALT}|' || CAST(c_custkey AS VARCHAR)), 1, 16)
         AS customer_token,
       '***' || substr(md5('{TOKEN_SALT}|name|' || c_name), 1, 4) AS name_masked,
       c_nationkey AS nation_key,
       (floor(c_acctbal / {ACCTBAL_BUCKET})::BIGINT * {ACCTBAL_BUCKET})
         AS acctbal_band_lo,
       (floor(c_acctbal / {ACCTBAL_BUCKET})::BIGINT * {ACCTBAL_BUCKET}
        + {ACCTBAL_BUCKET}) AS acctbal_band_hi,
       c_mktsegment AS segment
FROM customer
"""


def pseudonymized_revenue_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prove the token space stays joinable: total order revenue per
    customer TOKEN — the same salted-md5 expression applied to the
    orders FK matches the pseudonymized dimension without ever exposing
    the raw key in the output. Broadcast dim join + one hash aggregate;
    the token is computed in the scan projection on both sides."""
    orders = read_testdata(spark, sf_dir, "orders")
    fact_token = F.substring(
        F.md5(F.concat(F.lit(TOKEN_SALT + "|"), F.col("o_custkey").cast("string"))),
        1,
        16,
    )
    dim = pseudonymize_customers(spark, sf_dir).select(
        "customer_token", "segment"
    )
    return (
        orders.select(
            fact_token.alias("customer_token"),
            F.col("o_totalprice").cast("decimal(12,2)").alias("_p"),
        )
        .join(F.broadcast(dim), "customer_token")
        .groupBy("customer_token", "segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("_p").cast("double").alias("total_revenue"),
        )
    )


PSEUDONYMIZED_REVENUE_JOIN_SQL = f"""
WITH dim AS (
  SELECT substr(md5('{TOKEN_SALT}|' || CAST(c_custkey AS VARCHAR)), 1, 16)
           AS customer_token,
         c_mktsegment AS segment
  FROM customer
)
SELECT f.customer_token, d.segment,
       count(*)::BIGINT AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
         AS total_revenue
FROM (
  SELECT substr(md5('{TOKEN_SALT}|' || CAST(o_custkey AS VARCHAR)), 1, 16)
           AS customer_token,
         o_totalprice
  FROM orders
) f
JOIN dim d USING (customer_token)
GROUP BY 1, 2
"""


# Deny-list terms for the redaction demo — on the synthetic corpus the
# entity-ish tokens appear often enough to exercise non-trivial counts.
REDACT_TERMS = ("customer", "supplier")
REDACT_MASK = "[REDACTED]"


def redact_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deny-list redaction over the documents table — the erasure-
    request shape a GDPR pipeline runs at corpus scale: every
    occurrence of each listed term is replaced by a mask token, with a
    per-term occurrence count kept for the audit trail. One narrow
    projection, pure JVM regex (whole-stage codegen, no shuffle, no
    UDF): cost is a single scan regardless of list size, and the
    deny-list compiles into the plan as literal patterns — at 100 TB
    this is a map-only job with full predicate/column pushdown.

    Word boundaries (\\b) keep 'customers' distinct from 'customer'
    (only exact tokens redact); patterns stay in the RE2-and-Java-
    common subset so the DuckDB oracle replays them byte-identically.

    Reference analog: none — extension surface (privacy family, beside
    the salted-token pseudonymization at privacy.py:28)."""
    from de_final_project_spark.sources.readers import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    out = docs.select(
        "doc_id",
        F.col("text"),
        *[
            (
                F.size(F.split(F.col("text"), rf"\b{t}\b")) - 1
            ).cast("long").alias(f"n_{t}")
            for t in REDACT_TERMS
        ],
    )
    red = F.col("text")
    for t in REDACT_TERMS:
        red = F.regexp_replace(red, rf"\b{t}\b", REDACT_MASK)
    return out.select(
        "doc_id",
        *[f"n_{t}" for t in REDACT_TERMS],
        red.alias("redacted_text"),
    ).where(sum(F.col(f"n_{t}") for t in REDACT_TERMS) > 0)


REDACT_TERMS_SQL = f"""
SELECT doc_id,
       (length(regexp_split_to_array(text, '\\b{REDACT_TERMS[0]}\\b')) - 1)::BIGINT AS n_{REDACT_TERMS[0]},
       (length(regexp_split_to_array(text, '\\b{REDACT_TERMS[1]}\\b')) - 1)::BIGINT AS n_{REDACT_TERMS[1]},
       regexp_replace(
         regexp_replace(text, '\\b{REDACT_TERMS[0]}\\b', '{REDACT_MASK}', 'g'),
         '\\b{REDACT_TERMS[1]}\\b', '{REDACT_MASK}', 'g') AS redacted_text
FROM documents
WHERE (length(regexp_split_to_array(text, '\\b{REDACT_TERMS[0]}\\b')) - 1)
    + (length(regexp_split_to_array(text, '\\b{REDACT_TERMS[1]}\\b')) - 1) > 0
"""
