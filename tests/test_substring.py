"""Suffix-array substring pass: LCS math + winnowing guarantee + operator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deduplicator_spark.operators.substring import (
    longest_common_substring_len,
    substring_pairs,
    suffix_array,
)


def _lcs_brute(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


def test_suffix_array_sorts_suffixes():
    s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa = suffix_array(s)
    suffixes = [bytes(s[i:].astype(np.uint8)) for i in sa]
    assert suffixes == sorted(suffixes)


@pytest.mark.parametrize(
    "a,b",
    [
        ("hello world xyz", "say hello world now"),
        ("abcabcabc", "bcab"),
        ("", "anything"),
        ("same", "same"),
        ("no overlap at all", "zzzz qqqq"),
        ("aaaa", "aaaaaaa"),
    ],
)
def test_lcs_matches_brute_force(a, b):
    assert longest_common_substring_len(a, b) == _lcs_brute(a, b)


def test_lcs_random_fuzz():
    rng = np.random.Generator(np.random.PCG64(7))
    alphabet = "abcd "
    for _ in range(25):
        a = "".join(rng.choice(list(alphabet), size=rng.integers(0, 60)))
        b = "".join(rng.choice(list(alphabet), size=rng.integers(0, 60)))
        assert longest_common_substring_len(a, b) == _lcs_brute(a, b), (a, b)


def test_substring_operator_finds_planted_pairs(spark, small_pages, cfg):
    pairs, overflow = substring_pairs(
        small_pages.select("url", "text"), cfg
    )
    got = {(r["url_a"], r["url_b"]): r["matched_len"] for r in pairs.collect()}

    truth = (
        small_pages.filter(F.col("dup_kind") == "substring")
        .groupBy("truth_cluster_id")
        .agg(F.sort_array(F.collect_list("url")).alias("urls"))
        .collect()
    )
    assert truth
    for r in truth:
        ua, ub = r["urls"][0], r["urls"][1]
        key = (ua, ub) if ua < ub else (ub, ua)
        assert key in got, f"missed planted substring pair {key}"
        # the contained doc is >= min_len normalized chars by construction
        assert got[key] >= cfg.substring_min_len


def test_substring_star_and_long_keys(spark, cfg):
    """One hub doc contained in many others (a candidate star — the
    shape the grouped verify amortizes) with long surrogate ids; every
    hub-spoke pair must verify with the exact shared length."""
    core = "the quick brown fox jumps over the lazy dog " * 3  # >= min_len
    rows = [(0, core.strip())]
    rows += [
        (i, f"spoke {i} prefix text . {core} suffix {i}".strip()) for i in range(1, 13)
    ]
    pages = spark.createDataFrame(rows, "url long, text string")
    pairs, _ = substring_pairs(pages, cfg)
    got = {(r["url_a"], r["url_b"]): r["matched_len"] for r in pairs.collect()}
    norm_core = " ".join(core.lower().split())
    for i in range(1, 13):
        assert got.get((0, i), 0) >= len(norm_core), f"missed hub pair (0, {i})"


def test_substring_operator_no_degenerate_pairs(spark, small_pages, cfg):
    pairs, _ = substring_pairs(small_pages.select("url", "text"), cfg)
    deg = {r["url"] for r in small_pages.filter("dup_kind = 'degenerate'").collect()}
    for r in pairs.collect():
        assert r["url_a"] not in deg and r["url_b"] not in deg
