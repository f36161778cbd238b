"""Corpus-level statistics feeding per-document scores.

The CCNet/Gopher-style quality signals that CANNOT be computed per-row
(functions/text.py covers those): they need a full-corpus aggregation
pass whose result conditions every document's score.

- :func:`token_frequencies` — the corpus unigram table (token, cnt).
- :func:`unigram_logprob` — per-document mean negative log-probability
  under the corpus's own unigram model: the cheap stand-in for LM
  perplexity used to rank documents as ordinary/surprising (CCNet
  buckets its corpus by exactly this kind of score; high = rare-token
  text, low = boilerplate).

Scale plan (100 TB): three linear shuffles, nothing quadratic —
(1) token counts: one explode + map-side-combinable groupBy;
(2) the corpus total: a single scalar agg (one row to the driver);
(3) scoring: the token stream joins the frequency table on token
(hash join, AQE handles the heavy tail of frequent tokens) and
aggregates per doc. The frequency table is vocabulary-sized, far
smaller than the corpus; ln(cnt) is attached to the vocabulary BEFORE
the join so the big stream never computes logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")


def token_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unigram counts: (token, cnt), whitespace tokens,
    case-folded. One explode + one combinable shuffle."""
    return (
        df.select(F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's
    own unigram distribution:

        score(d) = ln(total_tokens) - mean over tokens t of ln(cnt_t)

    (algebraically mean(-ln(cnt_t / total)); the subtraction form does
    one ln per vocabulary entry instead of one division per token).
    Returns (rid, n_toks, avg_neg_logp). Empty documents score 0.0 —
    no evidence. Every token is in-vocabulary by construction (the
    model is fit on the same corpus), so there is no OOV smoothing.
    """
    freqs = token_frequencies(df, text_col)
    total = freqs.agg(F.sum("cnt")).collect()[0][0] or 0
    scored_vocab = freqs.select("token", F.log(F.col("cnt").cast("double")).alias("lc"))
    stream = df.select(F.col(id_col).alias("rid"), F.explode(_tokens(text_col)).alias("token"))
    per_doc = (
        stream.join(scored_vocab, "token")
        .groupBy("rid")
        .agg(F.count("*").alias("n"), F.sum("lc").alias("sl"))
    )
    return (
        df.select(F.col(id_col).alias("rid"))
        .join(per_doc, "rid", "left")
        .select(
            "rid",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_toks"),
            F.round(
                F.when(
                    F.col("n") > 0,
                    F.log(F.lit(float(total))) - F.col("sl") / F.col("n"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("avg_neg_logp"),
        )
    )
