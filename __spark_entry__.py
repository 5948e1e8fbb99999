"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship dedup pipeline on sf0.001.
``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL for
every SQL-expressible one (the rest get rows-only checks).

Column names are aliased identically on both sides; floats are rounded
on both sides so value hashes compare stably.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deduplicator_spark.config import DedupConfig
from deduplicator_spark.functions.fingerprints import make_fingerprint_udf
from deduplicator_spark.functions.quality import LANG_MARKERS, lang_id, n_tokens, quality_score
from deduplicator_spark.operators.ann import cosine_topk_pairs, hyperplane_lsh_pairs
from deduplicator_spark.operators.components import clusters_from_pairs
from deduplicator_spark.operators.lsh import band_explode, candidate_pairs, simhash_pairs, verify_pairs
from deduplicator_spark.operators.ranking import with_canonical
from deduplicator_spark.operators.series import filter_known_alts
from deduplicator_spark.plans.pipeline import DedupPipeline
from deduplicator_spark.sources.loaders import load_table
from deduplicator_spark.sources.pages import synth_pages_with_truth

CFG = DedupConfig()

# normalized-text SQL fragment shared by the oracle queries (must mirror
# deduplicator_spark.functions.text.normalize_text exactly)
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_NTOK = f"CASE WHEN length({_NORM}) = 0 THEN 0 ELSE len(string_split({_NORM}, ' ')) END"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _docs_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with url key (zero-padded doc_id so string order ==
    numeric order) and fingerprint struct columns."""
    fp = make_fingerprint_udf(CFG)
    return (
        _docs(spark, sf_dir)
        .select(F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("url"), "text")
        .select("url", fp(F.col("text")).alias("f"))
        .select("url", "f.*")
    )


# --------------------------------------------------------------------------
# SQL-expressible queries (Spark side)
# --------------------------------------------------------------------------

def q_exact_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (md5) dedup over documents PLUS a deterministic planted-dup
    slice (every 10th doc re-inserted under a shifted id) — sf0.01 has
    no natural byte-identical dups, so without the plant this oracle
    would pass vacuously with 0 rows (VERDICT r1 'What's wrong' #2).
    The identical plant is applied in the DuckDB oracle SQL."""
    base = _docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    planted = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    docs = base.unionByName(planted).select("doc_id", F.md5("text").alias("content_md5"))
    sizes = docs.groupBy("content_md5").agg(F.count("*").alias("cluster_size"))
    return (
        docs.join(sizes, "content_md5")
        .filter(F.col("cluster_size") >= 2)
        .select("doc_id", "content_md5", "cluster_size")
    )


def q_prefix_fp_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.md5(F.substring("text", 1, 60)).alias("prefix_fp")
    )
    return (
        docs.groupBy("prefix_fp")
        .agg(F.count("*").alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
    )


def q_prefix_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select(
        "doc_id", "n_chars", F.md5(F.substring("text", 1, 60)).alias("prefix_fp")
    )
    w = Window.partitionBy("prefix_fp").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    sized = docs.withColumn(
        "cluster_size", F.count("*").over(Window.partitionBy("prefix_fp"))
    ).withColumn("rn", F.row_number().over(w))
    return (
        sized.filter((F.col("cluster_size") >= 2) & (F.col("rn") == 1))
        .select("prefix_fp", F.col("doc_id").alias("canonical_doc_id"), "cluster_size")
    )


def q_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        q_prefix_fp_clusters(spark, sf_dir)
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
    )


def q_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    known = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return docs.join(known, "doc_id", "left_anti").select("doc_id")


def q_purge_whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    keep = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi").select("doc_id", "source")


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        n_tokens("text").alias("n_tok"),
        quality_score("text").alias("quality"),
    )


def q_lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(lang_id("text").alias("lang_pred")).groupBy("lang_pred").agg(
        F.count("*").alias("n")
    )


def q_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.select("lang", n_tokens("text").alias("nt"), F.length("text").alias("nc"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            F.round(F.avg("nc"), 4).alias("avg_chars"),
        )
    )


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.md5(F.substring("text", 1, 60)).alias("prefix_fp"),
    )


def q_embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 80)
    return cosine_topk_pairs(emb, k=20)


def q_minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship operator: MinHash -> LSH bands -> exact-Jaccard verify.

    Oracle-checkable because the verifier emits exactly the pairs with
    token-5-gram Jaccard >= 0.8 (LSH miss probability at J>=0.8 is
    ~5e-8 with b=32, r=4 — below the value-hash resolution).
    """
    # localCheckpoint: the fingerprint UDF pass runs once, not once per
    # downstream branch (banding, verify join a, verify join b)
    fp = _docs_fp(spark, sf_dir).localCheckpoint()
    banded = band_explode(fp, CFG)
    pairs, _ = candidate_pairs(banded, CFG)
    verified = verify_pairs(pairs, fp, CFG)
    return verified.select(
        F.col("url_a").cast("long").alias("id_a"),
        F.col("url_b").cast("long").alias("id_b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH pairs -> connected components -> cluster table (rows-only:
    iterative CC is not single-statement SQL)."""
    pairs = q_minhash_near_dup_pairs(spark, sf_dir)
    edges = pairs.select(
        F.lpad(F.col("id_a").cast("string"), 10, "0").alias("url_a"),
        F.lpad(F.col("id_b").cast("string"), 10, "0").alias("url_b"),
    )
    return clusters_from_pairs(edges, min_size=2).select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_min_doc_id"),
        "cluster_size",
    )


def q_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = _docs_fp(spark, sf_dir)
    return simhash_pairs(fp, CFG).select(
        F.col("url_a").cast("long").alias("id_a"),
        F.col("url_b").cast("long").alias("id_b"),
        "hamming",
    )


def q_ann_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return hyperplane_lsh_pairs(emb, dim=64, min_cosine=0.5)


def q_pipeline_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline on the deterministic synthetic pages fixture
    (n=500, seed=42): the end-to-end flagship on the BASELINE.json
    input_hint schema."""
    pages = synth_pages_with_truth(spark, 500).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    out = DedupPipeline(spark, CFG, work_dir=None, run_id="entry").run(pages)
    return out["actions"]


def q_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array substring pass (winnowing anchors guarantee recall
    1.0 for matches >= min_len; rows-only: iterative numpy SA verify
    is not single-statement SQL)."""
    from deduplicator_spark.operators.substring import substring_pairs

    pages = synth_pages_with_truth(spark, 500).select("url", "text")
    pairs, _ = substring_pairs(pages, CFG)
    return pairs


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing smoke: binary media -> feature vectors with
    quarantine semantics (decode stubbed, plumbing real)."""
    from deduplicator_spark.operators.multimodal import extract_media_features

    pages = synth_pages_with_truth(spark, 200).select(
        "url", F.lit("image").alias("media_type"), F.col("html").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )
    return extract_media_features(pages).select("url", "media_type", "byte_len", "n_frames")


def q_alt_series_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 alt filter over synthetic near-dup clusters (rows-only)."""
    df = synth_pages_with_truth(spark, 500).select(
        "url", F.col("truth_cluster_id").cast("string").alias("cluster_id")
    )
    return filter_known_alts(df).groupBy("cluster_id").agg(F.count("*").alias("kept"))


# --------------------------------------------------------------------------
# contract functions
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dedup pipeline on sf0.001 documents mapped to the
    pages shape; returns the actions audit table."""
    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("url"),
        F.current_timestamp().alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        "text",
        "lang",
    )
    out = DedupPipeline(spark, CFG, work_dir=None, run_id="entry-smoke").run(
        pages, min_cluster_size=1
    )
    return out["actions"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dup_clusters": q_exact_dup_clusters,
        "prefix_fp_clusters": q_prefix_fp_clusters,
        "prefix_canonical": q_prefix_canonical,
        "cluster_size_histogram": q_cluster_size_histogram,
        "incremental_scan": q_incremental_scan,
        "purge_whitelist": q_purge_whitelist,
        "quality_scores": q_quality_scores,
        "lang_id_counts": q_lang_id_counts,
        "token_stats_by_lang": q_token_stats_by_lang,
        "doc_fingerprints": q_doc_fingerprints,
        "embedding_cosine_topk": q_embedding_cosine_topk,
        "minhash_near_dup_pairs": q_minhash_near_dup_pairs,
        "near_dup_clusters": q_near_dup_clusters,
        "simhash_candidates": q_simhash_candidates,
        "ann_lsh_pairs": q_ann_lsh_pairs,
        "pipeline_actions": q_pipeline_actions,
        "alt_series_filter": q_alt_series_filter,
        "substring_pairs": q_substring_pairs,
        "media_features": q_media_features,
    }


def _lang_hits_sql(words: list[str]) -> str:
    parts = [
        f"(len(string_split(' ' || {_NORM} || ' ', ' {w} ')) - 1)" for w in words
    ]
    return "(" + " + ".join(parts) + ")"


def oracle_sql() -> dict[str, str]:
    stop_hits = _lang_hits_sql(LANG_MARKERS["en"])
    lang_exprs = {lang: _lang_hits_sql(words) for lang, words in LANG_MARKERS.items()}
    best = "greatest(" + ", ".join(lang_exprs.values()) + ")"
    # earlier languages win ties — same order as functions.quality.lang_id
    lang_case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in LANG_MARKERS:
        lang_case += f"WHEN {lang_exprs[lang]} = {best} THEN '{lang}' "
    lang_case += "ELSE 'und' END"

    return {
        "exact_dup_clusters": """
            WITH docs AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
              UNION ALL
              SELECT CAST(doc_id AS BIGINT) + 10000000, text
              FROM documents WHERE doc_id % 10 = 0
            )
            SELECT doc_id, content_md5, cluster_size FROM (
              SELECT doc_id, md5(text) AS content_md5,
                     count(*) OVER (PARTITION BY md5(text)) AS cluster_size
              FROM docs)
            WHERE cluster_size >= 2
        """,
        "prefix_fp_clusters": """
            SELECT md5(substr(text, 1, 60)) AS prefix_fp, count(*) AS cluster_size
            FROM documents GROUP BY 1 HAVING count(*) >= 2
        """,
        "prefix_canonical": """
            SELECT prefix_fp, doc_id AS canonical_doc_id, cluster_size FROM (
              SELECT md5(substr(text, 1, 60)) AS prefix_fp, doc_id,
                     count(*) OVER (PARTITION BY md5(substr(text, 1, 60))) AS cluster_size,
                     row_number() OVER (PARTITION BY md5(substr(text, 1, 60))
                                        ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM documents)
            WHERE cluster_size >= 2 AND rn = 1
        """,
        "cluster_size_histogram": """
            SELECT cluster_size, count(*) AS n_clusters FROM (
              SELECT count(*) AS cluster_size FROM documents
              GROUP BY md5(substr(text, 1, 60)) HAVING count(*) >= 2)
            GROUP BY cluster_size
        """,
        "incremental_scan": """
            SELECT doc_id FROM documents WHERE doc_id % 7 <> 0
        """,
        "purge_whitelist": """
            SELECT doc_id, source FROM documents WHERE doc_id % 5 = 0
        """,
        "quality_scores": f"""
            SELECT doc_id, {_NTOK} AS n_tok,
                   round(least({_NTOK} / 100.0, 1.0) * 0.6 +
                         least(CASE WHEN {_NTOK} > 0
                               THEN ({stop_hits} * 1.0 / {_NTOK}) * 10.0
                               ELSE 0.0 END, 1.0) * 0.4, 6) AS quality
            FROM documents
        """,
        "lang_id_counts": f"""
            SELECT {lang_case} AS lang_pred, count(*) AS n
            FROM documents GROUP BY 1
        """,
        "token_stats_by_lang": f"""
            SELECT lang, count(*) AS n_docs,
                   CAST(sum({_NTOK}) AS BIGINT) AS total_tokens,
                   round(avg(length(text)), 4) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "doc_fingerprints": """
            SELECT doc_id, md5(text) AS content_md5,
                   md5(substr(text, 1, 60)) AS prefix_fp
            FROM documents
        """,
        "embedding_cosine_topk": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 5) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 80 AND b.vec_id < 80
            ORDER BY cosine DESC, id_a, id_b LIMIT 20
        """,
        "minhash_near_dup_pairs": r"""
            WITH t AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
              FROM documents),
            s AS (
              SELECT doc_id,
                     list_distinct([array_to_string(toks[i:i+4], ' ')
                                    for i in range(1, len(toks) - 3)]) AS shingles
              FROM t WHERE len(toks) >= 5)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                         / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
                  / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        """,
    }
