"""PII detection / redaction over the documents table.

A standard training-data-pipeline pass (C4/RefinedWeb-style): find
email / IPv4 / phone-number spans, count them, and emit a redacted copy
of the text. Everything is a per-row projection — regex scan + replace —
so the op is ONE narrow pass with zero shuffle at any corpus size.

The synthetic documents corpus is digit-free, so the op deterministically
augments each document with PII-shaped tokens derived from doc_id (docs
with doc_id % 5 == 0 stay clean, exercising the no-match path). The same
augmentation expression runs in the DuckDB oracle, so detection counts and
the md5 of the redacted text are value-checked end to end.

Regex portability: patterns are alternation-free with greedy bounded
quantifiers, a subset where Java regex (Spark) and RE2 (DuckDB) agree on
every match span. Redaction order (email -> ip -> phone) matters and is
identical on both sides.

Reference analog: the connector has no content inspection — this is part
of the beyond-reference LLM-pipeline surface (SURVEY §2C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..session import read_table

EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
IP_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}-[0-9]{1,4}"


def _aug_text() -> Column:
    """text + deterministic PII-shaped suffix for doc_id % 5 != 0."""
    suffix = F.concat_ws(
        "",
        F.lit(" contact user"),
        (F.col("doc_id") % 97).cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" call +1-555-0100-"),
        (F.col("doc_id") % 10000).cast("string"),
    )
    return F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 5 != 0, suffix).otherwise(F.lit("")),
    )


_SQL_AUG = (
    "text || CASE WHEN doc_id % 5 <> 0 THEN"
    " ' contact user' || CAST(doc_id % 97 AS VARCHAR)"
    " || '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.0.' || CAST(doc_id % 100 AS VARCHAR)"
    " || ' call +1-555-0100-' || CAST(doc_id % 10000 AS VARCHAR)"
    " ELSE '' END"
)


def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII counts + redacted-text checksum.

    Two stacked projections (augment, then scan+redact) over one scan —
    no shuffle, no Python. The redacted text itself is corpus-sized, so
    only its md5 leaves the operator; a real pipeline would write the
    redacted column to the sink instead."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.select("doc_id", _aug_text().alias("aug"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), EMAIL_RE, "<EMAIL>"),
            IP_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    n_emails = F.size(F.regexp_extract_all(F.col("aug"), F.lit(EMAIL_RE), F.lit(0)))
    n_ips = F.size(F.regexp_extract_all(F.col("aug"), F.lit(IP_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(F.col("aug"), F.lit(PHONE_RE), F.lit(0)))
    return aug.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        (n_emails + n_ips + n_phones).cast("long").alias("pii_total"),
        ((n_emails + n_ips + n_phones) > 0).alias("has_pii"),
        F.md5(redacted).alias("redacted_md5"),
    )


SQL_PII_SCAN = f"""
WITH aug_t AS (
  SELECT doc_id, {_SQL_AUG} AS aug FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(aug, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(aug, '{IP_RE}')) AS BIGINT) AS n_ips,
  CAST(len(regexp_extract_all(aug, '{PHONE_RE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(aug, '{EMAIL_RE}'))
     + len(regexp_extract_all(aug, '{IP_RE}'))
     + len(regexp_extract_all(aug, '{PHONE_RE}')) AS BIGINT) AS pii_total,
  (len(regexp_extract_all(aug, '{EMAIL_RE}'))
     + len(regexp_extract_all(aug, '{IP_RE}'))
     + len(regexp_extract_all(aug, '{PHONE_RE}'))) > 0 AS has_pii,
  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        '{EMAIL_RE}', '<EMAIL>', 'g'),
        '{IP_RE}', '<IP>', 'g'),
        '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM aug_t
"""

ORACLES = {"pii_scan": SQL_PII_SCAN}
QUERIES = {"pii_scan": pii_scan}


def pii_density_by_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII risk table per (source, lang): docs affected, hit counts per
    category, and hits per 10k characters — the per-slice report a privacy
    review asks for before any source is admitted to the training mix (the
    pii_scan rollup; scan once, aggregate small)."""
    per_doc = pii_scan(spark, sf_dir).select(
        "doc_id", "n_emails", "n_ips", "n_phones", "pii_total", "has_pii"
    )
    dims = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", F.length("text").alias("n_chars_actual")
    )
    return (
        per_doc.join(dims, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("has_pii").cast("long")).alias("docs_with_pii"),
            F.sum("n_emails").alias("emails"),
            F.sum("n_ips").alias("ips"),
            F.sum("n_phones").alias("phones"),
            F.sum("pii_total").alias("pii_total"),
            F.sum("n_chars_actual").alias("chars"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "docs_with_pii",
            "emails",
            "ips",
            "phones",
            "pii_total",
            H.round6(F.col("docs_with_pii") / F.col("n_docs").cast("double")).alias(
                "doc_share"
            ),
            H.round6(
                F.col("pii_total") * F.lit(10000.0) / F.col("chars").cast("double")
            ).alias("hits_per_10k_chars"),
        )
        .orderBy("source", "lang")
    )


SQL_PII_DENSITY_BY_SLICE = f"""
WITH per_doc AS ({SQL_PII_SCAN}),
joined AS (
  SELECT p.*, d.source, d.lang, len(d.text) AS n_chars_actual
  FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
),
agg AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN has_pii THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
         CAST(SUM(n_emails) AS BIGINT) AS emails,
         CAST(SUM(n_ips) AS BIGINT) AS ips,
         CAST(SUM(n_phones) AS BIGINT) AS phones,
         CAST(SUM(pii_total) AS BIGINT) AS pii_total,
         CAST(SUM(n_chars_actual) AS BIGINT) AS chars
  FROM joined GROUP BY 1, 2
)
SELECT source, lang, n_docs, docs_with_pii, emails, ips, phones, pii_total,
       {H.sql_round6("docs_with_pii / CAST(n_docs AS DOUBLE)")} AS doc_share,
       {H.sql_round6("pii_total * 10000.0 / CAST(chars AS DOUBLE)")} AS hits_per_10k_chars
FROM agg ORDER BY source, lang
"""

QUERIES["pii_density_by_slice"] = pii_density_by_slice
ORACLES["pii_density_by_slice"] = SQL_PII_DENSITY_BY_SLICE
