"""Pipeline configuration.

The reference keys one physical database per fingerprint config
(``"{name}.s{hashsize}"``, dedupc.py:670, dupedb.py:120-128): a config
change means an incompatible index.  We mirror that: ``DedupConfig`` is
frozen, hashable, and carries a ``config_id`` string that stamps every
derived table, so fingerprints computed under different configs can
never be mixed.

The frozen default (k=5 token shingles, 128 perms, 32 bands x 4 rows,
verify Jaccard >= 0.8) is the analog of the reference's ``hashsize=12``
default (dedupc.py:586): the single knob controlling match fuzziness.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- shingling ---
    shingle_k: int = 5            # token k-grams
    # --- MinHash ---
    num_perm: int = 128
    bands: int = 32
    rows_per_band: int = 4
    # --- verification ---
    verify_jaccard: float = 0.8   # exact shingle-Jaccard acceptance bar
    est_jaccard_prefilter: float = 0.6  # signature-estimate prefilter (recall-safe)
    # --- SimHash ---
    simhash_bits: int = 64
    simhash_hamming: int = 3      # max hamming distance for simhash-dup
    # --- substring pass ---
    substring_min_len: int = 50   # chars; matches >= this are substring dups
    winnow_gram: int = 20         # char-gram size for winnowing fingerprints
    # --- seeds / determinism ---
    seed: int = 42
    # --- scale / skew knobs ---
    max_band_bucket: int = 2000   # cap pairs-per-LSH-bucket; overflow logged, never silent
    shuffle_partitions: int = 32
    # Execution-only knob (not part of config_id): candidate-pair row
    # count up to which the two-stage verify uses the broadcast shape —
    # id-only pair/candidate frames become build-side broadcasts and
    # the corpus-wide signature/shingle columns are pruned at the scan,
    # so no full-corpus array column ever crosses an exchange.  16 B of
    # ids per pair row -> 4M rows is ~64 MB raw (the session's
    # autoBroadcastJoinThreshold); above it the verify falls back to
    # the sort-merge shape, which is also the honest 10^10-pair web
    # posture (where verify_pairs_two_stage_recompute is the
    # documented at-scale shape).
    broadcast_pairs_rows: int = 4_000_000

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}x{self.rows_per_band}) "
                f"must equal num_perm ({self.num_perm})"
            )
        if self.shingle_k < 1:
            raise ValueError("shingle_k must be >= 1")

    @property
    def config_id(self) -> str:
        """Stable identity string; the analog of the reference's
        ``{name}.s{hashsize}`` shelve-name convention (dedupc.py:670)."""
        return (
            f"k{self.shingle_k}.p{self.num_perm}.b{self.bands}"
            f"r{self.rows_per_band}.j{int(self.verify_jaccard * 100)}"
            f".s{self.seed}"
        )


#: The frozen config used by goldens, oracle tests and bench alike
#: (FIXTURES.md section 5).
DEFAULT_CONFIG = DedupConfig()
