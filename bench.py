#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline: end-to-end MinHash+LSH near-dup dedup throughput (docs/sec)
over a deterministic synthetic pages table sized to the scale factor
(sf0.1 -> 50k docs), read from parquet like a real ingest.  Also times
the exact-dedup pass, the documents-table LSH chain, ANN pair search,
and the full pipeline with ranking.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_N_DOCS (override synthetic corpus size).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from deduplicator_spark.config import DedupConfig  # noqa: E402
from deduplicator_spark.operators.ann import hyperplane_lsh_pairs  # noqa: E402
from deduplicator_spark.operators.components import clusters_from_pairs  # noqa: E402
from deduplicator_spark.operators.exact import exact_clusters  # noqa: E402
from deduplicator_spark.operators.lsh import band_explode, candidate_pairs, verify_pairs_two_stage  # noqa: E402
from deduplicator_spark.functions.fingerprints import make_fingerprint_udf  # noqa: E402
from deduplicator_spark.plans.pipeline import DedupPipeline  # noqa: E402
from deduplicator_spark.session import build_session  # noqa: E402
from deduplicator_spark.sources.loaders import load_table  # noqa: E402
from deduplicator_spark.sources.pages import synth_pages  # noqa: E402

CFG = DedupConfig()


def _sf_of(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return 0.1


CORPUS_FILES = 96  # fixed file count -> scan splits provide parallelism


def ensure_corpus(spark, n: int) -> str:
    """Deterministic synthetic pages parquet (generated once, reused).
    Written as many small files so the scan parallelizes at any core
    count without a text repartition (a real ingest reads many files)."""
    path = os.path.join(
        os.environ.get("BENCH_TMP", "/tmp"),
        f"bench_pages_n{n}_s{CFG.seed}_p{CORPUS_FILES}",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_pages(spark, n, partitions=CORPUS_FILES).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_docs = int(os.environ.get("BENCH_N_DOCS", str(max(2000, int(500_000 * sf)))))

    spark = build_session(
        app_name="dedup-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,  # see session.py: 1x-cores spills on wide rows
        extra_conf={
            # finer scan splits so the many-file corpus yields several
            # task waves per stage (straggler amortization — see
            # bench_scaling.py for the measured rationale)
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = ensure_corpus(spark, n_docs)

    timings: dict[str, float] = {}
    runs_detail: dict[str, list[float]] = {}

    def timed(name: str, fn, runs: int = 3):
        """Median of ``runs`` timed executions: this box is shared and
        single-shot timings swing ±3-4x with background load (observed
        q1 = 26s and 86s back-to-back, warm, same code)."""
        import statistics

        out = None
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            out = fn()
            samples.append(round(time.monotonic() - t0, 3))
        timings[name] = statistics.median(samples)
        runs_detail[name] = samples
        return out

    # warm up the JVM + Arrow path on a small slice
    warm = spark.read.parquet(corpus).limit(500)
    fp_udf = make_fingerprint_udf(CFG)
    warm.select(fp_udf("text").alias("f")).select(F.sum("f.n_shingles")).collect()

    # q1: headline — end-to-end near-dup dedup (fingerprint -> LSH ->
    # verify -> connected components) on the synthetic corpus
    def q1():
        from deduplicator_spark.plans.chain import (
            checkpoint_parquet,
            decode_clusters,
            encode_fp,
            encode_ids,
        )

        # no repartition: the corpus is CORPUS_FILES small files, so
        # scan splits already exceed the core count (see bench_scaling.py)
        pages = spark.read.parquet(corpus)
        fp = pages.select("url", fp_udf(F.col("text")).alias("f")).select("url", "f.*")
        # parquet checkpoint: fingerprint once, downstream reads prune
        # columns (chain.checkpoint_parquet); measured inside q1
        fp = checkpoint_parquet(fp, "q1_fp")
        dict_ids, hash_ok = encode_ids(fp)
        fp_n = encode_fp(fp, dict_ids, hash_ok)
        banded = band_explode(fp_n, CFG)
        pairs, _ = candidate_pairs(banded, CFG)
        verified = verify_pairs_two_stage(pairs, fp_n, CFG)
        clusters = decode_clusters(clusters_from_pairs(verified, min_size=2), dict_ids)
        return clusters.count()

    # full warm-up pass: the 500-doc slice above warms Arrow/Python
    # workers but not the join/CC code paths — a cold q1 measures JIT
    # and scheduler warm-up, not the operator (observed 61s -> 27s
    # cold-vs-warm on the same session).  One untimed full run first,
    # same protocol as bench_scaling.py.
    q1()
    n_clustered = timed("q1_minhash_lsh_dedup", q1)

    # q1b: the at-scale verify shape — NO stored shingle arrays
    # (signatures only; exact verify recomputes shingles for candidate
    # docs).  Identical clusters to q1 (equivalence-tested); on
    # realistic sparse-dup corpora with web-length docs this shape
    # avoids serializing KBs of shingles per doc.
    def q1b():
        from deduplicator_spark.operators.lsh import verify_pairs_two_stage_recompute
        from deduplicator_spark.plans.chain import (
            checkpoint_parquet,
            decode_clusters,
            encode_fp,
            encode_ids,
        )

        fp_udf_lean = make_fingerprint_udf(CFG, include_shingles=False)
        pages = spark.read.parquet(corpus)
        fp = pages.select("url", "text", fp_udf_lean(F.col("text")).alias("f")).select(
            "url", "text", "f.*"
        )
        fp = checkpoint_parquet(fp, "q1b_fp")
        dict_ids, hash_ok = encode_ids(fp)
        fp_n = encode_fp(fp, dict_ids, hash_ok)
        banded = band_explode(fp_n, CFG)
        pairs, _ = candidate_pairs(banded, CFG)
        verified = verify_pairs_two_stage_recompute(
            pairs, fp_n, fp_n.select("url", "text"), CFG
        )
        clusters = decode_clusters(clusters_from_pairs(verified, min_size=2), dict_ids)
        return clusters.count()

    n_clustered_b = timed("q1b_lsh_dedup_recompute", q1b, runs=2)
    assert n_clustered_b == n_clustered, (n_clustered_b, n_clustered)

    # q2: exact dedup (md5 groupBy) over the same corpus
    def q2():
        return exact_clusters(spark.read.parquet(corpus)).count()

    timed("q2_exact_dedup", q2)

    # q3: documents-table LSH chain (the oracle-checked flagship)
    def q3():
        import __spark_entry__ as e

        return e.q_minhash_near_dup_pairs(spark, sf_dir).count()

    timed("q3_documents_near_dup", q3)

    # q4: ANN hyperplane-LSH pair search over embeddings
    def q4():
        emb = load_table(spark, sf_dir, "embeddings")
        return hyperplane_lsh_pairs(emb, dim=64, min_cosine=0.5).count()

    timed("q4_ann_lsh", q4)

    # q5: full pipeline incl. ranking/actions (no checkpoint dir)
    def q5():
        pages = spark.read.parquet(corpus)
        out = DedupPipeline(spark, CFG, work_dir=None, run_id="bench").run(pages)
        return out["actions"].count()

    timed("q5_full_pipeline", q5, runs=2)

    # q6: segment-level dedup (10-word windows shared across docs) over
    # the same corpus — the CCNet/Falcon line-dedup analog
    def q6():
        from deduplicator_spark.operators.segments import duplicate_segment_stats

        pages = spark.read.parquet(corpus)
        return duplicate_segment_stats(pages, key="url", w=10, min_docs=2).count()

    timed("q6_segment_dedup", q6, runs=2)

    # q7: content-defined chunking + chunk dedup stats over the corpus
    def q7():
        from deduplicator_spark.operators.cdc import cdc_chunk_table, cdc_dedup_stats

        pages = spark.read.parquet(corpus)
        chunks = cdc_chunk_table(pages, url_col="url")
        return cdc_dedup_stats(chunks, url_col="url").count()

    timed("q7_cdc_chunk_dedup", q7, runs=2)

    # q8: the S4 decode source in the measured path (VERDICT r2 #6) —
    # the SAME flagship pipeline but starting from raw html, with the
    # extractor deriving text inside the job.  Cluster output must
    # equal the text-path run (byte-identity invariant).  4 runs + a
    # per-stage breakdown + an extract-only probe (VERDICT r3 #3: the
    # first measurement was bimodal at n=2 and could not separate the
    # extract UDF from host load).  Extraction is FUSED into the
    # fingerprints stage (one scan, html never checkpointed), so the
    # extract share = q8 fingerprints wall - q5 fingerprints wall, and
    # the standalone probe bounds it independently.
    q8_stages: dict[str, float] = {}

    def q8():
        pages = spark.read.parquet(corpus)
        pipe = DedupPipeline(spark, CFG, work_dir=None, run_id="bench-html")
        out = pipe.run(pages, extract_text_from_html=True)
        n = out["clusters"].count()
        q8_stages.clear()
        q8_stages.update({m.stage: m.wall_s for m in pipe.metrics})
        return n

    n_clusters_html = timed("q8_pipeline_from_html", q8, runs=4)

    def q8_extract_probe():
        from deduplicator_spark.sources.extract import extract_text

        pages = spark.read.parquet(corpus)
        return (
            pages.select(extract_text(F.col("html")).alias("t"))
            .agg(F.sum(F.length("t")))
            .collect()[0][0]
        )

    timed("q8_extract_only", q8_extract_probe, runs=3)

    def q_text_clusters():
        pages = spark.read.parquet(corpus)
        out = DedupPipeline(spark, CFG, work_dir=None, run_id="bench-text").run(pages)
        return out["clusters"].count()

    assert n_clusters_html == q_text_clusters(), "html-path clusters != text-path"

    # q9: full pipeline WITH the suffix-array substring stage at sf0.1
    # (VERDICT r2 #8: the salt-group verify had never been profiled at
    # 50k docs); per-stage wall times go into the JSON detail
    q9_stages: dict[str, float] = {}

    def q9():
        pages = spark.read.parquet(corpus)
        pipe = DedupPipeline(spark, CFG, work_dir=None, run_id="bench-sub")
        out = pipe.run(pages, include_substring=True)
        n = out["actions"].count()
        q9_stages.clear()
        q9_stages.update({m.stage: m.wall_s for m in pipe.metrics})
        return n

    timed("q9_pipeline_with_substring", q9, runs=2)

    # recall at the BENCHED scale (VERDICT r3 #6): the >=0.99 bar was
    # previously pinned only at fixture scale (300 docs).  Here: a
    # deterministic ~10% stratified sample of the corpus (url-hash
    # strata — no RNG), exact truth = shingle-Jaccard >= threshold
    # computed via a distributed shingle inverted index (never all
    # pairs), recall measured against the PRODUCTION chain's final
    # clusters (reference cluster semantics: a truth pair is recalled
    # iff both docs land in the same output cluster — transitive
    # closure counts, exactly like the reference's shelve groups).
    def recall_probe() -> dict:
        from deduplicator_spark.plans.chain import (
            checkpoint_parquet,
            decode_clusters,
            encode_fp,
            encode_ids,
        )

        t0 = time.monotonic()
        sample = (
            spark.read.parquet(corpus)
            .where(F.pmod(F.xxhash64("url"), F.lit(10)) == 0)
        )
        fp = sample.select("url", fp_udf(F.col("text")).alias("f")).select(
            "url", "f.*"
        )
        fp = checkpoint_parquet(fp, "recall_fp")
        # exact truth pairs via inverted index on the (distinct) shingle
        # arrays: per-shingle bucket join -> intersection counts ->
        # Jaccard from stored set sizes.  Shingle hashes are the same
        # space the chain's verify compares, so this IS the brute-force
        # oracle of tests/test_dedup_chain.py, distributed.
        ex = fp.select("url", F.explode("shingles").alias("sh"))
        inter = (
            ex.alias("a")
            .join(ex.alias("b"), "sh")
            .where(F.col("a.url") < F.col("b.url"))
            .groupBy(F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b"))
            .agg(F.count("*").alias("inter"))
        )
        sizes = fp.select("url", "n_shingles")
        truth = (
            inter.join(
                sizes.withColumnsRenamed({"url": "url_a", "n_shingles": "na"}), "url_a"
            )
            .join(
                sizes.withColumnsRenamed({"url": "url_b", "n_shingles": "nb"}), "url_b"
            )
            .where(
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter"))
                >= F.lit(CFG.verify_jaccard)
            )
            .select("url_a", "url_b")
        )
        truth = checkpoint_parquet(truth, "recall_truth")
        # production chain on the same sample -> final clusters
        dict_ids, hash_ok = encode_ids(fp)
        fp_n = encode_fp(fp, dict_ids, hash_ok)
        banded = band_explode(fp_n, CFG)
        pairs, _ = candidate_pairs(banded, CFG)
        verified = verify_pairs_two_stage(pairs, fp_n, CFG)
        clusters = decode_clusters(
            clusters_from_pairs(verified, min_size=2), dict_ids
        ).select("url", "cluster_id")
        hit = (
            truth.join(
                clusters.withColumnsRenamed({"url": "url_a", "cluster_id": "ca"}),
                "url_a",
            )
            .join(
                clusters.withColumnsRenamed({"url": "url_b", "cluster_id": "cb"}),
                "url_b",
            )
            .where(F.col("ca") == F.col("cb"))
        )
        n_truth, n_hit = truth.count(), hit.count()
        return {
            "sample_docs": sample.count(),
            "truth_pairs": n_truth,
            "recalled_pairs": n_hit,
            "recall": round(n_hit / n_truth, 5) if n_truth else None,
            "wall_s": round(time.monotonic() - t0, 1),
        }

    recall = recall_probe()

    # q1b is an alternate verify shape of q1; q6-q9 are new ops/shapes
    # added after BASELINE.md was frozen — keep the headline total
    # comparable across rounds by excluding them
    _extra = {
        "q1b_lsh_dedup_recompute",
        "q6_segment_dedup",
        "q7_cdc_chunk_dedup",
        "q8_pipeline_from_html",
        "q8_extract_only",
        "q9_pipeline_with_substring",
    }
    total = round(sum(v for k, v in timings.items() if k not in _extra), 3)
    result = {
        "metric": "e2e_near_dup_dedup",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec_q1": round(n_docs / timings["q1_minhash_lsh_dedup"], 1),
        "clustered_rows_q1": n_clustered,
        "cpus": cpus,
        "config": CFG.config_id,
        "q8_stage_walls": q8_stages,
        "q9_stage_walls": q9_stages,
        "recall_at_sf": recall,
        "runs": runs_detail,
        # medians are the headline (comparable across rounds); the
        # per-query best is the contention floor on this shared box —
        # observed same-code medians swing 34s..95s with neighbor load
        # (BENCH/BASELINE.md documents the ±2-4x noise)
        "queries_best": {k: min(v) for k, v in runs_detail.items()},
    }
    # attach the north-rule scaling evidence (bench_scaling.py --write)
    # so the per-round bench JSON is self-contained
    scaling_path = os.path.join(ROOT, "BENCH", "RESULTS.json")
    if os.path.exists(scaling_path):
        try:
            with open(scaling_path) as f:
                s = json.load(f)
            result["scaling"] = {
                "efficiency_e2e": s.get("value"),
                "efficiency_fp_stage": s.get("fp_stage_efficiency"),
                "pairing": s.get("unit"),
                "n_docs": s.get("n_docs"),
            }
        except (json.JSONDecodeError, OSError):
            pass
    # the headline criterion number is the LARGEST size-ladder rung —
    # the at-scale measurement (tools/scaling_size_ladder.py, raw runs
    # + REST shuffle/CPU stamps in BENCH/SIZE_LADDER.json; narrative in
    # BENCH/BASELINE.md).  The 200k RESULTS.json window above is the
    # standing round-over-round fixture, not the at-scale reading.
    ladder_path = os.path.join(ROOT, "BENCH", "SIZE_LADDER.json")
    if os.path.exists(ladder_path):
        try:
            with open(ladder_path) as f:
                ladder = json.load(f)
            top = max(ladder, key=int)
            rung = ladder[top]
            result["scaling_at_scale"] = {
                "n_docs": int(top),
                "efficiency_e2e": rung.get("efficiency_e2e"),
                "efficiency_fp_stage": rung.get("efficiency_fp_stage"),
                "pairing": "(T_2/T_8)/4",
                "low_runs_s": rung.get("low_runs_s"),
                "high_runs_s": rung.get("high_runs_s"),
                "calibration": rung.get("calibration"),
                "windows": rung.get("windows"),
                "pairing_efficiencies": rung.get("pairing_efficiencies"),
                "criterion_met": (rung.get("efficiency_e2e") or 0) >= 0.8,
            }
        except (json.JSONDecodeError, OSError, ValueError):
            pass
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
