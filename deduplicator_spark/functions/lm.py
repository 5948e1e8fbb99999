"""Corpus-trained n-gram language-model scoring (CCNet-style quality
signal).

CCNet ranks web documents by the perplexity of a KenLM 5-gram model;
the distributed analog here trains a bigram model *on the corpus
itself* (two map-side-combined count aggregations) and scores every
document with stupid-backoff log-probabilities:

    p(w2 | w1) = c(w1 w2) / c(w1)        if the bigram survived pruning
               = 0.4 * c(w2) / N         otherwise (backoff to unigram)
               = 0.4 * 1 / N             for out-of-vocabulary w2

Determinism contract: each bigram's log-prob is quantized per row to
integer micro-nats (round(ln(p) * 1e6) as bigint) BEFORE any
aggregation, so the per-doc sums are exact integer arithmetic —
invariant to Spark's partial-agg ordering and reproducible bit-for-bit
by a DuckDB oracle.  A 1-ulp ln() difference between libm
implementations only matters within ~1e-10 of a rounding boundary.

Scale notes (100 TB): token/bigram extraction is JVM split/transform
(no UDF, no extra shuffle — explode is map-side).  The two count aggs
combine map-side, and ``min_count`` pruning bounds the model table, so
the three scoring joins are plain hash equi-joins on short string keys
that AQE will broadcast when the pruned model fits.  Nothing is
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalize_text

BACKOFF = 0.4  # stupid-backoff penalty (Brants et al. 2007)


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks array) for docs with >= 2 tokens (bigram-scorable)."""
    norm = normalize_text(text_col)
    return (
        docs.select(F.col(id_col), F.split(norm, " ").alias("toks"))
        .filter((F.length(norm) > 0) & (F.size("toks") >= 2))
    )


def _bigrams(toks: DataFrame, id_col: str) -> DataFrame:
    """Explode each doc's token array into 'w1 w2' bigram strings.

    transform over a 0..n-2 index sequence keeps the whole expansion
    inside whole-stage codegen; the >=2-token filter upstream guards
    sequence() against a descending 0..-1 range.
    """
    bg = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("toks", i + 1), F.element_at("toks", i + 2)
        ),
    )
    return toks.select(F.col(id_col), F.explode(bg).alias("bigram"))


def train_bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """(unigram counts, pruned bigram counts) over the corpus.

    Unigrams are kept unpruned (they are the backoff distribution and
    the w1 denominators); bigrams below ``min_count`` are dropped —
    the deterministic pruning that bounds the model at corpus scale
    (top-k would depend on tie order; a count threshold does not).
    """
    toks = _tokens(docs, id_col, text_col)
    uni = (
        toks.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c_uni"))
    )
    bi = (
        _bigrams(toks, id_col)
        .groupBy("bigram")
        .agg(F.count("*").alias("c_bi"))
        .filter(F.col("c_bi") >= min_count)
    )
    return uni, bi


def lm_score(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc stupid-backoff bigram log-likelihood.

    Returns (id, n_bigrams, sum_logp_micro, lm_score) where
    ``sum_logp_micro`` is the exact integer sum of per-bigram
    micro-nat log-probs and ``lm_score`` = mean nats per bigram
    (rounded to 4 decimals).  Higher (closer to 0) = more typical of
    the corpus; gibberish and boilerplate-free outliers score low.
    """
    n_total = F.broadcast(
        unigrams.agg(F.sum("c_uni").cast("double").alias("n_total"))
    )
    toks = _tokens(docs, id_col, text_col)
    pairs = _bigrams(toks, id_col).withColumn(
        "w1", F.split(F.col("bigram"), " ").getItem(0)
    ).withColumn("w2", F.split(F.col("bigram"), " ").getItem(1))

    scored = (
        pairs.join(bigrams, "bigram", "left")
        .join(
            unigrams.select(F.col("tok").alias("w1"), F.col("c_uni").alias("c_w1")),
            "w1",
            "left",
        )
        .join(
            unigrams.select(F.col("tok").alias("w2"), F.col("c_uni").alias("c_w2")),
            "w2",
            "left",
        )
        .crossJoin(n_total)
    )
    p = (
        F.when(
            F.col("c_bi").isNotNull() & F.col("c_w1").isNotNull(),
            F.col("c_bi").cast("double") / F.col("c_w1").cast("double"),
        )
        .when(
            F.col("c_w2").isNotNull(),
            F.lit(BACKOFF) * F.col("c_w2").cast("double") / F.col("n_total"),
        )
        .otherwise(F.lit(BACKOFF) / F.col("n_total"))
    )
    micro = F.round(F.log(p) * F.lit(1e6), 0).cast("long")
    return (
        scored.select(F.col(id_col), micro.alias("logp_micro"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("logp_micro").alias("sum_logp_micro"),
        )
        .select(
            id_col,
            "n_bigrams",
            "sum_logp_micro",
            F.round(
                F.col("sum_logp_micro").cast("double")
                / F.col("n_bigrams").cast("double")
                / F.lit(1e6),
                4,
            ).alias("lm_score"),
        )
    )
