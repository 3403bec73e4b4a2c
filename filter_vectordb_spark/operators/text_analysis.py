"""Corpus-level text analysis: language identification by character
n-gram profiles (north-star extension).

Classic Cavnar-Trenkle shape, fully distributed:
  train: explode docs into char trigrams → count per (lang, trigram) →
         keep the top-M trigrams per language with a rank weight
  score: explode unlabeled docs the same way, join on trigram (profile
         table is tiny → broadcast), sum weights per (doc, lang), argmax.

Both phases are plain groupBy/join/window plans — no Python in the loop.
Accuracy on the synthetic fixture is chance (text is independent of the
`lang` column there); the determinism and plumbing are what tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOP_M = 200


def _trigram_table(docs: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    s = F.lower(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - 2, F.lit(1))),
        lambda i: F.substr(s, i, F.lit(3)),
    )
    # materialize the gram array at an exchange, then explode_outer — a
    # plain explode's implicit size()>0 filter would push below the
    # exchange and re-evaluate the whole trigram expression per scan row
    # (see operators/dedup.py::shingle_table)
    return (
        docs.select(*id_cols, F.array_distinct(grams).alias("_grams"))
        .repartition(*id_cols)
        .select(*id_cols, F.explode_outer("_grams").alias("trigram"))
        .filter(F.length("trigram") == 3)
    )


def train_lang_profiles(docs: DataFrame, lang_col: str = "lang", text_col: str = "text") -> DataFrame:
    """(lang, trigram, weight): top-M trigrams per language, weight =
    M − rank (most characteristic trigram weighs most)."""
    counts = (
        _trigram_table(docs, [lang_col], text_col)
        .groupBy(lang_col, "trigram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(lang_col).orderBy(F.col("cnt").desc(), F.col("trigram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_M)
        .select(F.col(lang_col).alias("lang"), "trigram", (F.lit(TOP_M) - F.col("rank")).alias("weight"))
    )


def predict_lang(docs: DataFrame, profiles: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, score): argmax profile overlap per document.
    Deterministic tiebreak: lexicographically smallest language."""
    doc_grams = _trigram_table(docs, [id_col], text_col)
    scored = (
        doc_grams.join(F.broadcast(profiles), "trigram")
        .groupBy(id_col, "lang")
        .agg(F.sum("weight").alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("lang").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col).alias("doc_id"), F.col("lang").alias("lang_pred"), "score")
    )
