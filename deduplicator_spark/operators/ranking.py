"""Canonical-selection ranking — the reference's keep/delete logic as
window/aggregate column algebra.

Reference semantics re-expressed (file:line cites into /root/reference):

- R1 content quality (makeImageSortTuple, dedupc.py:62-68):
  (-frames, -pixels, -bytes, -density) -> text analog
  (-n_tokens, -n_chars, -byte_len, -density) with an explicit final
  url tiebreak (the reference relied on Python's stable sort order; a
  distributed engine needs a total order).
- R2 dir quality (makeDirSortTuple, dedupc.py:70-77):
  (-good_word_hits, +bad_word_hits, -dir_len) over the url directory.
- R3 name quality (makeNameSortTuple, dedupc.py:79-88):
  (+is_hex_hash, -good_hits, +bad_hits, -punct_count("-_ +"),
   +is_series_name).
- R4 composite = (R1, R2, R3) lexicographic (makeSortTupleAll,
  dedupc.py:91-96).
- R5 keep-first (dedupc.py:180, 213-216): rank 1 -> canonical.
- R7 getSuperState (dedupc.py:473-568): best content / best dir /
  best name chosen independently, both tie-broken toward the best
  content row (dedupc.py:508-515), dest = dir(best_dir) +
  name(best_name) + ext(best_content); the filesystem isfile-probe
  suffix loop (dedupc.py:524-529) becomes a deterministic
  row_number collision suffix (no probing).

All ratings are orderable structs so "rating equality" (the R7
tiebreaks) is plain struct comparison.  One shuffle on cluster_id
serves every aggregate; no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from deduplicator_spark.functions.text import punct_count


# --- url decomposition (os.path.split / splitext analogs) -------------------

def url_leaf(c: Column) -> Column:
    return F.substring_index(c, "/", -1)


def url_dir(c: Column) -> Column:
    leaf = url_leaf(c)
    return F.substring(c, 1, F.length(c) - F.length(leaf) - 1)


def leaf_ext(c: Column) -> Column:
    """'.html' for 'a.html', '' when no dot."""
    leaf = url_leaf(c)
    return F.when(
        leaf.contains("."), F.concat(F.lit("."), F.substring_index(leaf, ".", -1))
    ).otherwise(F.lit(""))


def leaf_stem(c: Column) -> Column:
    leaf = url_leaf(c)
    return F.substring(leaf, 1, F.length(leaf) - F.length(leaf_ext(c)))


def _word_hits(c: Column, words: list[str]) -> Column:
    """sum of substring occurrence counts — the reference's
    ``sum(x.count(w) for w in words)`` (dedupc.py:74-75, 84-86)."""
    if not words:
        return F.lit(0)
    hits = [F.size(F.split(F.lower(c), F.lit(w.lower()), -1)) - 1 for w in words]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


# --- rating structs ---------------------------------------------------------

def content_rating(n_tokens: Column, n_chars: Column, byte_len: Column) -> Column:
    """R1: smaller struct = better (matches reference tuple polarity)."""
    density = byte_len.cast("double") / F.greatest(n_tokens.cast("double"), F.lit(1.0))
    return F.struct(
        (-n_tokens).alias("neg_tokens"),
        (-n_chars).alias("neg_chars"),
        (-byte_len).alias("neg_bytes"),
        (-density).alias("neg_density"),
    )


def dir_rating(url: Column, good_words: list[str] | None = None, bad_words: list[str] | None = None) -> Column:
    d = F.lower(url_dir(url))
    return F.struct(
        (-_word_hits(d, good_words or [])).alias("neg_good"),
        _word_hits(d, bad_words or []).alias("bad"),
        (-F.length(url_dir(url))).alias("neg_depth"),
    )


def name_rating(url: Column, good_words: list[str] | None = None, bad_words: list[str] | None = None) -> Column:
    name = F.lower(url_leaf(url))
    return F.struct(
        name.rlike(r"^[0-9a-f]{36}\.").cast("int").alias("is_hex"),
        (-_word_hits(name, good_words or [])).alias("neg_good"),
        _word_hits(name, bad_words or []).alias("bad"),
        (-punct_count(name)).alias("neg_punct"),
        name.rlike(r" \(\d+\)\.").cast("int").alias("is_series"),
    )


# --- R5: rank within cluster ------------------------------------------------

def with_canonical(
    clustered: DataFrame,
    cluster_col: str = "cluster_id",
    n_tokens: str = "n_tokens",
    n_chars: str = "n_chars",
    byte_len: str = "byte_len",
    good_dirs: list[str] | None = None,
    bad_dirs: list[str] | None = None,
    good_names: list[str] | None = None,
    bad_names: list[str] | None = None,
) -> DataFrame:
    """Adds rank (R4 composite order) and is_canonical (R5 top-1)."""
    url = F.col("url")
    order = [
        content_rating(F.col(n_tokens), F.col(n_chars), F.col(byte_len)),
        dir_rating(url, good_dirs, bad_dirs),
        name_rating(url, good_names, bad_names),
        url,
    ]
    w = Window.partitionBy(cluster_col).orderBy(*order)
    return clustered.withColumn("rank", F.row_number().over(w)).withColumn(
        "is_canonical", F.col("rank") == 1
    )


# --- R7: three-axis super-state --------------------------------------------

def super_state(
    clustered: DataFrame,
    cluster_col: str = "cluster_id",
    good_dirs: list[str] | None = None,
    bad_dirs: list[str] | None = None,
    good_names: list[str] | None = None,
    bad_names: list[str] | None = None,
) -> DataFrame:
    """Per-cluster plan: (cluster_id, keep_url, dest_path, needs_move,
    n_deletions, explain).

    Input needs columns: url, cluster_id, n_tokens, n_chars, byte_len.
    """
    url = F.col("url")
    cr = content_rating(F.col("n_tokens"), F.col("n_chars"), F.col("byte_len"))
    dr = dir_rating(url, good_dirs, bad_dirs)
    nr = name_rating(url, good_names, bad_names)

    enriched = clustered.select(
        F.col(cluster_col).alias("cluster_id"),
        url.alias("url"),
        cr.alias("cr"),
        dr.alias("dr"),
        nr.alias("nr"),
        url_dir(url).alias("dirp"),
        url_leaf(url).alias("leaf"),
        leaf_stem(url).alias("stem"),
        leaf_ext(url).alias("ext"),
    )

    member = F.struct("url", "cr", "dr", "nr", "dirp", "leaf", "stem", "ext")
    g = enriched.groupBy("cluster_id").agg(
        F.min_by(member, F.struct("cr", "url")).alias("best_content"),
        F.min_by(member, F.struct("dr", "url")).alias("best_dir"),
        F.min_by(member, F.struct("nr", "url")).alias("best_name"),
        F.count("*").alias("cluster_size"),
        # bounded sample for the per-member explanation lines: never
        # collect an unbounded mega-cluster onto one row
        F.slice(F.sort_array(F.collect_list("url")), 1, 11).alias("member_sample"),
    )

    # Tie-break toward best content (dedupc.py:508-515): if the best
    # content row's name/dir rating ties the independent winner, prefer it.
    name_src = F.when(
        (F.col("best_content.leaf") != F.col("best_name.leaf"))
        & (F.col("best_content.nr") == F.col("best_name.nr")),
        F.col("best_content"),
    ).otherwise(F.col("best_name"))
    dir_src = F.when(
        (F.col("best_content.dirp") != F.col("best_dir.dirp"))
        & (F.col("best_content.dr") == F.col("best_dir.dr")),
        F.col("best_content"),
    ).otherwise(F.col("best_dir"))

    planned = g.select(
        "cluster_id",
        "cluster_size",
        "member_sample",
        F.col("best_content.url").alias("keep_url"),
        dir_src["url"].alias("dir_src_url"),
        name_src["url"].alias("name_src_url"),
        F.concat(
            dir_src["dirp"], F.lit("/"), name_src["stem"], F.col("best_content.ext")
        ).alias("dest_path"),
    )

    # Deterministic collision suffix replacing the isfile-probe loop
    # (dedupc.py:524-529; SURVEY P9): second/third/... cluster claiming the
    # same dest gets `_1`, `_2`, ... before the extension.
    wc = Window.partitionBy("dest_path").orderBy("cluster_id")
    rn = F.row_number().over(wc)
    ext = F.when(
        F.col("dest_path").rlike(r"\.[^/.]+$"),
        F.concat(F.lit("."), F.substring_index(F.col("dest_path"), ".", -1)),
    ).otherwise(F.lit(""))
    stem_all = F.substring(F.col("dest_path"), 1, F.length("dest_path") - F.length(ext))
    deduped = planned.withColumn(
        "dest_path",
        F.when(rn == 1, F.col("dest_path")).otherwise(
            F.concat(stem_all, F.format_string("_%d", rn - 1), ext)
        ),
    )

    # R8 rich explanation (dedupc.py:99-106, 436-470, 532-557): the
    # sort-axes header, the move/keep marks ('> dest', '^ moved-from',
    # '+ kept in place'), the provenance of the chosen dir and name,
    # and one '- url' line per (sampled) deletion.  All built from
    # already-aggregated columns — no extra shuffle.
    needs_move = F.col("keep_url") != F.col("dest_path")
    header = F.lit(
        "sort: content(-tokens, -chars, -bytes, -density), "
        "dir(-good, +bad, -depth), name(+hex, -good, +bad, -punct, +series)"
    )
    move_part = F.when(
        needs_move,
        F.concat(F.lit("\n\t> "), F.col("dest_path"), F.lit("\n\t^ "), F.col("keep_url")),
    ).otherwise(F.concat(F.lit("\n\t+ "), F.col("keep_url")))
    provenance = F.concat(
        F.lit("\n\tdir from "),
        F.col("dir_src_url"),
        F.lit("\n\tname from "),
        F.col("name_src_url"),
    )
    deletions = F.aggregate(
        F.filter(F.col("member_sample"), lambda u: u != F.col("keep_url")),
        F.lit(""),
        lambda acc, u: F.concat(acc, F.lit("\n\t- "), u),
    )
    truncated = F.when(
        F.col("cluster_size") > F.size("member_sample"),
        F.format_string(
            "\n\t- ... %d more", F.col("cluster_size") - F.size("member_sample")
        ),
    ).otherwise(F.lit(""))

    return deduped.select(
        "cluster_id",
        "keep_url",
        "dest_path",
        needs_move.alias("needs_move"),
        (F.col("cluster_size") - 1).alias("n_deletions"),
        F.concat(header, move_part, provenance, deletions, truncated).alias("explain"),
    )


def actions_from_ranking(ranked: DataFrame, cluster_col: str = "cluster_id") -> DataFrame:
    """R5 -> actions audit rows (S8/S9 analog: no physical delete, an
    append-only action log; dedupc.py:213-216, 24-32)."""
    return ranked.select(
        F.col(cluster_col).alias("cluster_id"),
        "url",
        F.when(F.col("is_canonical"), F.lit("keep")).otherwise(F.lit("delete")).alias("op"),
    )
