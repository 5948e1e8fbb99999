#!/usr/bin/env python
"""Generate the committed golden fixtures under tests/golden/.

No Spark anywhere in this script — every golden is produced by an
INDEPENDENT single-machine implementation (plain numpy / pandas /
difflib) so the driver's DuckDB oracles that read these files check the
distributed engine against a second implementation, not against itself:

- pages_n500_s42.parquet   the deterministic synthetic pages fixture
  (pure function of (seed,row,n); partition-invariant by construction,
  pinned against the Spark generator by tests/test_goldens.py)
- simhash_sf001.parquet    (doc_id, simhash) over sf0.01 documents —
  per-doc shift-arithmetic bit-majority, a different code path from the
  UDF's batched unpackbits/reduceat form
- ann_sig_sf001.parquet    (vec_id, sig) hyperplane sign signatures
  over sf0.01 embeddings (same seeded planes, independent matmul)
- substring_pairs_n500.parquet  (url_a, url_b, matched_len) — true
  longest-common-substring >= 50 normalized chars, candidates from an
  exact 50-gram inverted index (recall 1.0: any common substring of
  length >= L contains a shared L-gram), lengths from difflib's
  find_longest_match (stdlib, unrelated to the engine's suffix array)

Run:  python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys
from difflib import SequenceMatcher

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
GOLDEN = os.path.join(ROOT, "tests", "golden")
SF001 = "/root/testdata/sf0.01"

_U64 = np.uint64
_SHINGLE_BASE = _U64(0x100000001B3)  # must match functions.fingerprints
MIN_SUB_LEN = 50  # chars; must match DedupConfig.substring_min_len


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def make_pages(n: int = 500, seed: int = 42) -> str:
    from deduplicator_spark.sources.pages import _gen_batch

    pdf = _gen_batch(np.arange(n, dtype=np.int64), n, seed)
    out = os.path.join(GOLDEN, f"pages_n{n}_s{seed}.parquet")
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("truth_cluster_id", pa.int64()),
            ("dup_kind", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), out)
    return out


def _doc_shingles(text: str, k: int = 5) -> np.ndarray:
    """Multiset of k-token shingle hashes of ONE doc (same hash math as
    the engine, but per-doc — no batch segment bookkeeping)."""
    toks = (text or "").lower().split()
    if len(toks) < k:
        return np.empty(0, dtype=_U64)
    th = pd.util.hash_array(np.asarray(toks, dtype=object))
    win = np.lib.stride_tricks.sliding_window_view(th, k)
    weights = _SHINGLE_BASE ** np.arange(k, dtype=_U64)
    with np.errstate(over="ignore"):
        return _splitmix64((win * weights).sum(axis=1, dtype=_U64))


def simhash_one(text: str, k: int = 5) -> int | None:
    """Bitwise-majority SimHash via shift arithmetic (bit i of the
    result is set iff more than half the shingle hashes have bit i
    set) — provably equal to the engine's unpackbits/packbits form
    because both apply the same per-bit majority."""
    sh = _doc_shingles(text, k)
    n = len(sh)
    if n == 0:
        return None
    out = _U64(0)
    for i in range(64):
        cnt = int(((sh >> _U64(i)) & _U64(1)).sum())
        if 2 * cnt > n:
            out |= _U64(1) << _U64(i)
    return int(out.astype(np.int64))


def make_simhash() -> str:
    docs = pq.read_table(os.path.join(SF001, "documents.parquet"), columns=["doc_id", "text"]).to_pandas()
    rows = [
        (int(d), s)
        for d, t in zip(docs["doc_id"], docs["text"])
        if (s := simhash_one(t)) is not None
    ]
    out = os.path.join(GOLDEN, "simhash_sf001.parquet")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "simhash": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, out)
    return out


def make_ann_sig(dim: int = 64, bits: int = 16, seed: int = 42) -> str:
    emb = pq.read_table(os.path.join(SF001, "embeddings.parquet"), columns=["vec_id", "embedding"]).to_pandas()
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((dim, bits))
    M = np.stack(emb["embedding"].to_numpy())
    signs = (M @ planes) > 0
    weights = 1 << np.arange(bits, dtype=np.int64)
    sigs = (signs @ weights).astype(np.int64)
    out = os.path.join(GOLDEN, "ann_sig_sf001.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(emb["vec_id"].astype(np.int64), pa.int64()),
                "sig": pa.array(sigs, pa.int64()),
            }
        ),
        out,
    )
    return out


def make_ivf_cells(dim: int = 64, n_cells: int = 16, seed: int = 42) -> str:
    """Independent IVF cell assignment: same seeded centroids, plain
    numpy argmax (no Spark/Arrow batching)."""
    emb = pq.read_table(os.path.join(SF001, "embeddings.parquet"), columns=["vec_id", "embedding"]).to_pandas()
    rng = np.random.Generator(np.random.PCG64(seed + 0x1BF))
    centroids = rng.standard_normal((n_cells, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cells = np.argmax((M / norms) @ centroids.T, axis=1).astype(np.int32)
    out = os.path.join(GOLDEN, "ivf_cells_sf001.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(emb["vec_id"].astype(np.int64), pa.int64()),
                "cell": pa.array(cells, pa.int32()),
            }
        ),
        out,
    )
    return out


def make_rolling_fp(k: int = 20, min_len: int = 50) -> str:
    """Independent per-doc winnowing fingerprint aggregates over sf0.01
    documents: pure-Python int arithmetic mod 2^64 (no numpy sliding
    windows, no vectorized min) — a second implementation of the
    rolling polynomial k-gram hash + window-minimum selection that
    operators/substring.py's UDF computes.

    Output: (doc_id, n_anchors, min_anchor, anchor_xor) — min/xor over
    the SIGNED int64 view, matching the engine's long columns."""
    docs = pq.read_table(
        os.path.join(SF001, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()
    w = min_len - k + 1
    M = 1 << 64
    weights = [pow(0x100000001B3, i, M) for i in range(k)]
    rows = []
    for r in docs:
        norm = " ".join((r["text"] or "").lower().split())
        b = norm.encode("utf-8")
        if len(b) < k:
            continue
        grams = []
        for j in range(len(b) - k + 1):
            h = sum(b[j + i] * weights[i] for i in range(k)) % M
            h = ((h ^ (h >> 31)) * 0xBF58476D1CE4E5B9) % M
            grams.append(h)
        if len(grams) <= w:
            anchors = set(grams)
        else:
            anchors = {min(grams[t : t + w]) for t in range(len(grams) - w + 1)}
        signed = [a - M if a >= (1 << 63) else a for a in anchors]
        x = 0
        for a in anchors:
            x ^= a
        rows.append(
            (
                r["doc_id"],
                len(signed),
                min(signed),
                x - M if x >= (1 << 63) else x,
            )
        )
    out = os.path.join(GOLDEN, "rolling_fp_sf001.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "n_anchors": pa.array([r[1] for r in rows], pa.int64()),
                "min_anchor": pa.array([r[2] for r in rows], pa.int64()),
                "anchor_xor": pa.array([r[3] for r in rows], pa.int64()),
            }
        ),
        out,
    )
    return out


def make_substring_pairs(pages_path: str) -> str:
    pdf = pq.read_table(pages_path, columns=["url", "text"]).to_pandas()
    urls = pdf["url"].tolist()
    norm = [" ".join((t or "").lower().split()) for t in pdf["text"]]

    # exact 50-gram inverted index -> candidate pairs (recall 1.0)
    index: dict[str, list[int]] = {}
    for i, t in enumerate(norm):
        for g in {t[j : j + MIN_SUB_LEN] for j in range(len(t) - MIN_SUB_LEN + 1)}:
            index.setdefault(g, []).append(i)
    cand: set[tuple[int, int]] = set()
    for members in index.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                cand.add((members[x], members[y]))

    rows = []
    for i, j in sorted(cand):
        a, b = norm[i], norm[j]
        m = SequenceMatcher(None, a, b, autojunk=False).find_longest_match(0, len(a), 0, len(b))
        if m.size >= MIN_SUB_LEN:
            ua, ub = sorted((urls[i], urls[j]))
            rows.append((ua, ub, m.size))
    rows.sort()
    out = os.path.join(GOLDEN, "substring_pairs_n500.parquet")
    pq.write_table(
        pa.table(
            {
                "url_a": pa.array([r[0] for r in rows], pa.string()),
                "url_b": pa.array([r[1] for r in rows], pa.string()),
                "matched_len": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
        out,
    )
    return out, len(rows)


def make_span_dedup(pages_path: str, L: int = MIN_SUB_LEN) -> str:
    """Independent duplicate-span removal golden (operators/spans.py):
    TRUE L-byte grams in a plain dict (no rolling hashes, no Spark).

    Keep-first coverage, computed exactly: byte position p of doc b is
    covered iff the gram b[p:p+L] occurs in some doc a with url_a <
    url_b — equivalently iff min(url of docs containing that gram) <
    url_b.  One pass builds gram -> min url; a second marks positions.
    """
    import hashlib

    pdf = pq.read_table(pages_path, columns=["url", "text"]).to_pandas()
    urls = pdf["url"].tolist()
    norm = [" ".join((t or "").lower().split()).encode("utf-8") for t in pdf["text"]]

    min_url: dict[bytes, str] = {}
    for u, nb in zip(urls, norm):
        for j in range(len(nb) - L + 1):
            g = nb[j : j + L]
            if g not in min_url or u < min_url[g]:
                min_url[g] = u

    rows = []
    for u, nb in zip(urls, norm):
        n = len(nb)
        covered = np.zeros(n, dtype=bool)
        for j in range(n - L + 1):
            if min_url[nb[j : j + L]] < u:
                covered[j : j + L] = True
        edges = np.flatnonzero(
            np.diff(np.concatenate(([0], covered.view(np.int8), [0])))
        )
        n_spans = len(edges) // 2
        cov = int(covered.sum())
        clean = bytes(np.frombuffer(nb, dtype=np.uint8)[~covered]) if n else b""
        rows.append((u, n, cov, n_spans, n - cov, hashlib.md5(clean).hexdigest()))

    out = os.path.join(GOLDEN, "span_dedup_n500.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "orig_len": pa.array([r[1] for r in rows], pa.int32()),
                "covered_chars": pa.array([r[2] for r in rows], pa.int32()),
                "n_spans": pa.array([r[3] for r in rows], pa.int32()),
                "clean_len": pa.array([r[4] for r in rows], pa.int32()),
                "clean_md5": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        out,
    )
    return out


def make_cdc_chunks(
    min_len: int = 32, avg_len: int = 128, max_len: int = 512, seed: int = 42
) -> str:
    # 32/128/512 (not the operator's web-page defaults) so the few-
    # hundred-byte sf0.01 docs split into several chunks each and the
    # shift-resync property is actually exercised at fixture scale
    """Golden CDC chunk table over sf0.01 documents + the same plants
    the `cdc_chunks` entry query applies (byte dup of every 10th doc at
    +10M, 'PREFIX WRAP: '-shifted copy of every 13th at +30M).

    INDEPENDENT implementation: the Gear hash is the sequential
    byte-at-a-time recurrence ``h = (h<<1) + gear[b] mod 2^64`` and the
    boundary walk scans positions forward — the engine's kernel
    (operators/cdc.py) is a 64-lane windowed vectorization with a
    candidate-index walk; agreeing output pins both.
    """
    import hashlib

    gear = [
        int.from_bytes(hashlib.md5(f"gear-{seed}-{b}".encode()).digest()[:8], "big")
        for b in range(256)
    ]

    def chunks_of(data: bytes) -> list[tuple[int, int, str]]:
        n = len(data)
        h, cands = 0, set()
        for pos in range(n):
            h = ((h << 1) + gear[data[pos]]) & 0xFFFFFFFFFFFFFFFF
            if h & (avg_len - 1) == 0:
                cands.add(pos)
        out, start = [], 0
        while start < n:
            limit = min(start + max_len, n)
            end = None
            for pos in range(start + min_len - 1, limit):
                if pos in cands:
                    end = pos
                    break
            if end is None:
                end = limit - 1
            out.append(
                (start, end - start + 1, hashlib.md5(data[start : end + 1]).hexdigest())
            )
            start = end + 1
        return out

    docs = pd.read_parquet(os.path.join(SF001, "documents.parquet"))[
        ["doc_id", "text"]
    ]
    corpus = [(int(r.doc_id), r.text) for r in docs.itertuples()]
    corpus += [
        (int(r.doc_id) + 10_000_000, r.text)
        for r in docs.itertuples()
        if r.doc_id % 10 == 0
    ]
    corpus += [
        (int(r.doc_id) + 30_000_000, "PREFIX WRAP: " + r.text)
        for r in docs.itertuples()
        if r.doc_id % 13 == 0
    ]
    rows = []
    for doc_id, text in corpus:
        for i, (s, ln, d) in enumerate(chunks_of(text.encode("utf-8"))):
            rows.append((doc_id, i, s, ln, d))
    out = os.path.join(GOLDEN, "cdc_chunks_sf001.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "chunk_idx": pa.array([r[1] for r in rows], pa.int32()),
                "start": pa.array([r[2] for r in rows], pa.int32()),
                "length": pa.array([r[3] for r in rows], pa.int32()),
                "chunk_md5": pa.array([r[4] for r in rows], pa.string()),
            }
        ),
        out,
    )
    return out


def make_media_decoded(n_px: int = 4) -> str:
    """(doc_id, bin, val) — real-decoder golden over sf0.01 documents.

    Each doc becomes a deterministic n_px x n_px RGB PPM whose raster
    is the doc's md5 digest tiled 3x (48 bytes).  Features here are
    computed by an INDEPENDENT per-pixel python loop (Rec.601
    luminance -> 16-bin histogram -> L2 norm), unrelated to the
    engine's vectorized pixel_features/mapInPandas path — the oracle
    for the `media_decoded_features` driver query."""
    import duckdb
    from hashlib import md5 as _md5

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF001}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    rows = []
    for doc_id, text in docs:
        raster = _md5(text.encode("utf-8")).digest() * 3  # 48 bytes = 4x4x3
        counts = [0] * 16
        for p in range(n_px * n_px):
            r, g, b = raster[3 * p], raster[3 * p + 1], raster[3 * p + 2]
            lum = 0.299 * r + 0.587 * g + 0.114 * b
            counts[min(int(lum) // 16, 15)] += 1
        norm = sum(c * c for c in counts) ** 0.5
        feats = [c / norm for c in counts]
        # float32 round-trip first (the engine emits float32 features),
        # THEN round — matches round(CAST(val AS DOUBLE), 6) on both sides
        for i, v in enumerate(feats):
            rows.append((int(doc_id), i, round(float(np.float32(v)), 6)))
    out = os.path.join(GOLDEN, "media_decoded_sf001.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "bin": pa.array([r[1] for r in rows], pa.int32()),
                "val": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        out,
    )
    return out


def main() -> None:
    os.makedirs(GOLDEN, exist_ok=True)
    p = make_pages()
    print("pages:", p)
    print("simhash:", make_simhash())
    print("ann_sig:", make_ann_sig())
    print("ivf_cells:", make_ivf_cells())
    print("rolling_fp:", make_rolling_fp())
    sub, n = make_substring_pairs(p)
    print("substring:", sub, n, "pairs")
    print("span_dedup:", make_span_dedup(p))
    print("cdc_chunks:", make_cdc_chunks())
    print("media_decoded:", make_media_decoded())


if __name__ == "__main__":
    main()
