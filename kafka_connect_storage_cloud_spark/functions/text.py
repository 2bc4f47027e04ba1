"""Text primitives shared by the LLM-pipeline operators: tokenization and
word-shingling as JVM-side expressions, with exact DuckDB SQL mirrors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS_SPLIT = r"\s+"


def words(text_col: str = "text") -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.col(text_col)), WS_SPLIT)


SQL_WORDS = "string_split_regex(lower(text), '\\s+')"


def shingles_from_ws(n: int = 3) -> Column:
    """The word n-gram shingle array of a pre-split `ws` column. Documents
    shorter than n words contribute one whole-text shingle. Exposed as an
    array (not exploded) so per-doc reductions over shingles — minhash,
    signature mins — stay zero-shuffle projections."""
    return F.when(
        F.size("ws") >= n,
        F.expr(
            f"transform(sequence(0, size(ws) - {n}), i -> concat_ws(' ', slice(ws, i + 1, {n})))"
        ),
    ).otherwise(F.array(F.concat_ws(" ", F.col("ws"))))


def with_shingles(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Explode each document into its word n-gram shingles (JVM-side
    transform/sequence/slice — no Python in the loop). For cross-doc
    grouping only; per-doc reductions should use shingles_from_ws."""
    df = df.withColumn("ws", words(text_col))
    return df.withColumn("shingle", F.explode(shingles_from_ws(n))).drop("ws")


def sql_shingles(n: int = 3) -> str:
    """DuckDB mirror of with_shingles: doc_id + exploded shingle.
    ws[i : i+n-1] is inclusive slicing -> n words."""
    return f"""
SELECT doc_id, unnest(
  CASE WHEN len(ws) >= {n}
       THEN [array_to_string(ws[i : i + {n - 1}], ' ') for i in generate_series(1, len(ws) - {n - 1})]
       ELSE [array_to_string(ws, ' ')] END
) AS shingle
FROM (SELECT doc_id, {SQL_WORDS} AS ws FROM documents)
"""
