"""Physical-plan regression guards: pushdown, pruning, broadcast.

These pin the Catalyst behaviors the 100 TB design depends on — if a
refactor breaks predicate pushdown or forces a sort-merge join where a
broadcast belongs, these fail before any benchmark notices.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deduplicator_spark.operators.exact import exact_clusters

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_and_column_pruning(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    plan = _plan(q)
    assert "PushedFilters" in plan and "EqualTo(lang,en)" in plan
    # scan must read only the referenced columns, never text
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema
    assert "doc_id" in read_schema and "n_chars" in read_schema


def test_exact_clusters_broadcasts_sizes(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumnRenamed(
        "doc_id", "url"
    )
    plan = _plan(exact_clusters(docs))
    assert "BroadcastHashJoin" in plan
    # partial (map-side) aggregation before the exchange
    assert plan.count("HashAggregate") >= 2


def test_ann_pair_dedup_carries_no_vectors(spark):
    """hyperplane_lsh_pairs: embedding arrays must NOT cross the
    candidate-expansion / pair-dedup exchanges — ids only, vectors
    attached after (VERDICT r1 'What's wrong' #5)."""
    from deduplicator_spark.operators.ann import hyperplane_lsh_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(hyperplane_lsh_pairs(emb, dim=64, min_cosine=0.3))
    # every Exchange that shuffles on pair/bucket keys (the candidate
    # expansion and its dedup) must have a vector-free Input schema —
    # vectors may only ride the per-side attach joins at the end.
    import re

    blocks = re.findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\s*\nArguments: hashpartitioning\(([^)]*)\)",
        plan,
    )
    assert blocks, "no hash exchanges found — plan shape changed?"
    pair_exchanges = [
        inp for inp, keys in blocks
        if ("url_a" in keys and "url_b" in keys) or "bucket_key" in keys or "band_" in keys
    ]
    assert pair_exchanges, "no pair-key exchanges found — plan shape changed?"
    for inp in pair_exchanges:
        assert not re.search(r"\bv(_a|_b)?#", inp), f"vector column crosses pair exchange: {inp}"


def test_ivf_pair_dedup_carries_no_vectors(spark):
    """ivf_pairs: same id-only discipline as the hyperplane path — the
    cell-bucket expansion and pair dedup shuffle ids, vectors attach
    per-side afterwards."""
    import re

    from deduplicator_spark.operators.ann import ivf_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(ivf_pairs(emb, dim=64, n_cells=16, min_cosine=0.3))
    blocks = re.findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\s*\nArguments: hashpartitioning\(([^)]*)\)",
        plan,
    )
    assert blocks, "no hash exchanges found — plan shape changed?"
    pair_exchanges = [
        inp for inp, keys in blocks
        if ("url_a" in keys and "url_b" in keys)
        or ("id_a" in keys and "id_b" in keys)
        or "bucket_key" in keys
        or "cell" in keys
    ]
    assert pair_exchanges, "no pair/cell-key exchanges found — plan shape changed?"
    for inp in pair_exchanges:
        assert not re.search(r"\bv(_a|_b)?#", inp), f"vector column crosses pair exchange: {inp}"


def test_lsh_band_explode_stays_jvm(spark, small_pages, cfg):
    """band_explode must be pure JVM expressions over the fingerprint
    frame — no Python evaluation nodes in its incremental plan."""
    from deduplicator_spark.functions.fingerprints import make_fingerprint_udf
    from deduplicator_spark.operators.lsh import band_explode

    fp_udf = make_fingerprint_udf(cfg)
    fp = small_pages.select("url", fp_udf("text").alias("f")).select("url", "f.*")
    fp = fp.localCheckpoint()  # cut off the UDF part of the plan
    plan = _plan(band_explode(fp, cfg))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, f"banding fell back to Python: {marker}"


def test_segment_dedup_sheds_text_before_shuffle(spark):
    """duplicate_segment_stats: the document text must not cross the
    seg_md5 exchanges — only the key and the 32-byte hash shuffle."""
    import re

    from deduplicator_spark.operators.segments import duplicate_segment_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(duplicate_segment_stats(docs, key="doc_id"))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, f"segment hashing fell back to Python: {marker}"
    blocks = re.findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan
    )
    assert blocks, "no exchanges found — plan shape changed?"
    for inp in blocks:
        assert not re.search(r"\btext#", inp), f"text crosses an exchange: {inp}"
    # map-side partial aggregation before the exchange
    assert plan.count("HashAggregate") >= 2


def test_gopher_filter_is_shuffle_free(spark):
    """gopher_quality_filter is pure per-row column algebra: no
    exchange, no Python eval, one codegen span over the scan."""
    from deduplicator_spark.operators.segments import gopher_quality_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(gopher_quality_filter(docs, key="doc_id"))
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    # formatted mode marks whole-stage codegen spans with [codegen id : N]
    assert "codegen id" in plan


def test_stratified_sample_is_shuffle_free(spark):
    """stratified_sample: membership is one JVM hash+compare per row —
    no exchange, no Python, and the scan never reads text."""
    from deduplicator_spark.sources.shards import stratified_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = stratified_sample(
        docs, key="doc_id", strata_col="lang", rates={"en": 0.25}, default_rate=0.75
    ).select("doc_id", "lang")
    plan = _plan(q)
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema


def test_segment_removal_hash_exchanges_carry_no_text(spark):
    """remove_duplicate_segments: the seg_md5 aggregation/join
    exchanges must shuffle only (key, idx, hash) — document words may
    cross ONLY the final per-key rebuild join (a rewrite op's output
    is text-sized; one text shuffle is the floor, more is a bug)."""
    import re

    from deduplicator_spark.operators.segments import remove_duplicate_segments

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(remove_duplicate_segments(docs, key="doc_id"))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, f"segment removal fell back to Python: {marker}"
    blocks = re.findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\s*\nArguments: hashpartitioning\(([^)]*)\)",
        plan,
    )
    seg_exchanges = [inp for inp, keys in blocks if "seg_md5" in keys]
    assert seg_exchanges, "no seg_md5 exchanges found — plan shape changed?"
    for inp in seg_exchanges:
        assert not re.search(r"\b(text|_w)#", inp), f"text crosses a seg_md5 exchange: {inp}"


def test_url_dedup_prunes_and_partial_aggs(spark):
    """url_dup_groups: scan reads only the url column; the canonical
    groupBy partial-aggregates map-side; everything stays JVM."""
    from deduplicator_spark.functions.urls import url_dup_groups

    pages = spark.read.parquet("tests/golden/pages_n500_s42.parquet").select("url")
    plan = _plan(url_dup_groups(pages, "url"))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "url" in read_schema and "html" not in read_schema and "text" not in read_schema
    assert plan.count("HashAggregate") >= 2
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_lm_score_stays_jvm_and_partial_aggs(spark):
    """Bigram-LM training and scoring must be pure JVM column algebra
    (split/transform/explode/join/agg) — no Python eval nodes — and
    both count aggregations must partial-aggregate map-side."""
    from deduplicator_spark.functions.lm import lm_score, train_bigram_lm

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    uni, bi = train_bigram_lm(docs)
    plan = _plan(lm_score(docs, uni, bi))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, f"LM path fell back to Python: {marker}"
    assert plan.count("HashAggregate") >= 4  # partial+final for counts and doc sums


def test_dedup_tiers_exchanges_carry_no_text(spark):
    """The tier rollup's url-keyed joins and the group agg must shuffle
    only keys/digests — document text never crosses an exchange."""
    import re

    from deduplicator_spark.operators.tiers import dedup_tiers

    pages = spark.read.parquet("tests/golden/pages_n500_s42.parquet").select("url", "text")
    near = pages.select("url", F.col("url").alias("cluster_id")).limit(0)
    plan = _plan(dedup_tiers(pages, near))
    blocks = re.findall(r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert blocks, "no exchanges found — plan shape changed?"
    for inp in blocks:
        assert not re.search(r"\btext#", inp), f"text crosses an exchange: {inp}"


def test_normalized_exact_reads_only_needed_columns(spark):
    """normalized_exact_clusters on a wide table: parquet scan must
    prune to (url, text) — the html/binary column stays unread."""
    from deduplicator_spark.operators.exact import normalized_exact_clusters

    pages = spark.read.parquet("tests/golden/pages_n500_s42.parquet")
    plan = _plan(normalized_exact_clusters(pages))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "html" not in read_schema and "warc_ts" not in read_schema
