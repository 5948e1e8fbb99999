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


def test_lcs_fast_equals_suffix_array():
    """lcs_len_fast (binary-search Rabin-Karp, byte-confirmed) must
    equal the suffix-array LCS on random and adversarial inputs —
    including full-identity, empty, and shared-prefix/suffix shapes."""
    import numpy as np

    from deduplicator_spark.operators.substring import (
        lcs_len_fast,
        longest_common_substring_len,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    alphabet = "ab cd"
    cases = []
    for n in (0, 1, 7, 63, 300):
        for m in (0, 5, 200):
            a = "".join(rng.choice(list(alphabet), n))
            b = "".join(rng.choice(list(alphabet), m))
            cases.append((a, b))
    base = "the common segment that should match exactly " * 4
    cases += [
        (base, base),                       # identical
        ("xx" + base, base + "yy"),         # shared middle
        (base[:50], base[40:]),             # overlapping windows
        ("abc", "xyz"),                     # nothing shared beyond chars
    ]
    for a, b in cases:
        xa = np.frombuffer(a.encode(), dtype=np.uint8)
        xb = np.frombuffer(b.encode(), dtype=np.uint8)
        fast = lcs_len_fast(xa, xb)
        assert fast is not None  # collisions are 2^-64 events
        assert fast == longest_common_substring_len(a, b), (a[:40], b[:40])


def test_lcs_fast_shared_a_state_across_partners():
    """One _ASideHasher reused across MANY partners (the verify_group
    shape after the r4 prefix-hash hoist) must give the same answers
    as fresh per-call state — including partners LONGER than the
    a-side (forces the powers cache to grow after the state was
    built) and enough distinct probe lengths to trip the per-L gram
    cache's eviction cap."""
    import numpy as np

    from deduplicator_spark.operators.substring import (
        _ASideHasher,
        lcs_len_fast,
        longest_common_substring_len,
    )

    rng = np.random.Generator(np.random.PCG64(11))
    alphabet = list("ab cd")
    a = "shared anchor text that many partners contain " * 6
    xa = np.frombuffer(a.encode(), dtype=np.uint8)
    a_state = _ASideHasher(xa)
    partners = []
    for m in (3, 17, 40, 90, 150, 260, 300, 700, 1200):
        noise = "".join(rng.choice(alphabet, m))
        partners += [noise, noise[: m // 2] + a[10:60] + noise[m // 2 :], a + noise]
    for b in partners:
        xb = np.frombuffer(b.encode(), dtype=np.uint8)
        shared = lcs_len_fast(xa, xb, a_state)
        fresh = lcs_len_fast(xa, xb)
        assert shared == fresh
        assert shared == longest_common_substring_len(a, b)


def test_lcs_fast_floor_contract():
    """floor-seeded search (VERDICT r4 next #5): results >= floor are
    the EXACT LCS; any result < floor only means "LCS < floor".  The
    verify path depends on exactness above the threshold and on the
    one-probe reject below it."""
    import numpy as np

    from deduplicator_spark.operators.substring import (
        _ASideHasher,
        lcs_len_fast,
        longest_common_substring_len,
    )

    rng = np.random.Generator(np.random.PCG64(7))
    alphabet = list("ab cd")
    a = "an anchor-guaranteed common stretch of text here " * 5
    xa = np.frombuffer(a.encode(), dtype=np.uint8)
    a_state = _ASideHasher(xa)
    cases = []
    for m in (10, 80, 400):
        noise = "".join(rng.choice(alphabet, m))
        cases += [noise, noise + a[5:90] + noise, a[:30], a]
    for b in cases:
        xb = np.frombuffer(b.encode(), dtype=np.uint8)
        truth = longest_common_substring_len(a, b)
        for floor in (0, 1, 8, 40, 85, len(a), len(a) + 50):
            got = lcs_len_fast(xa, xb, a_state, floor=floor)
            assert got is not None
            if truth >= floor:
                assert got == truth, (floor, truth, got, b[:40])
            else:
                assert got < floor, (floor, truth, got, b[:40])
