"""Corpus-level text analytics for LLM-data pipelines (north-star ops).

DataFrame-shaped companions to the scalar functions in ``functions/text.py``:
TF-IDF term ranking and corpus vocabulary stats. All pure Catalyst
expressions — token explode, two aggregations, one broadcast join — so the
plan is shuffle-minimal and survives a 100 TB corpus: the document-frequency
side aggregates to |vocab| rows and broadcasts back onto the term-frequency
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from experimentsplan_datapipeline_spark.operators.util import spread_small_input


def _tokens(text_col: str) -> F.Column:
    """Lowercased whitespace tokens (the same normalization the oracle uses)."""
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by tf-idf (ln smoothing-free idf).

    tf = in-document term count; idf = ln(N / df) with df = number of
    documents containing the term. Ranking uses the ROUNDED score with a
    term tiebreak so the top-k set is engine-reproducible.

    Shuffle shape: one explode -> one groupBy(doc, term) with map-side
    combine -> a doc-frequency agg that collapses to |vocab| rows (broadcast
    back) -> one window per doc. The corpus-sized side is shuffled once.
    """
    n_docs = df.count()
    tf = (
        spread_small_input(df)
        .select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(doc_freq), "term").select(
        F.col(id_col),
        F.col("term"),
        F.round(
            F.col("tf").cast("double") * F.log(F.lit(float(n_docs)) / F.col("df")),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )
