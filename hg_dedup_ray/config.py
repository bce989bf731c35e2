"""Pipeline configuration.

Mirrors the reference's CLI surface (reference indexing_v6_sharded.py:256-271,
find_remove_ranges.py:7-15, write_back_to_jsonl_sharded.py:11-17) as a single
dataclass consumed by ``pipelines.sa_dedup.build_pipeline``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class DedupConfig:
    # --- substring (suffix-array) dedup ---------------------------------
    # Minimum duplicate-run length in BYTES (reference `--minlen`;
    # production uses 500, toy workflows use 32: reference workflow_toy.sh:18,
    # aws_workflow.sh:2).
    minlen: int = 64
    # "annotate" attaches `sa_remove_ranges`; "remove" additionally emits
    # `text_deduped` with the ranges excised (reference `--mode`).
    mode: str = "annotate"
    # Corpus element width (reference `--token_dtype`): "u8" scans raw
    # utf-8 bytes (minlen in bytes — the only mode the reference's shipped
    # workflows use, aws_workflow.sh:112-116); "u16"/"u32" scan a TOKEN
    # corpus (minlen in tokens, reference indexing_v6_sharded.py:282-292).
    token_dtype: str = "u8"
    # Tokenizer for u16/u32 mode: "bytepair"/"bytequad" are the builtin
    # deterministic invertible fixed-width tokenizers (the scan path);
    # "minibpe" is the vendored variable-width BPE exercising the HF
    # offset-mapping surface in CI; gpt2/llama/olmo route to the HF
    # adapter (gated on `transformers`, unavailable offline).
    tokenizer: str = "bytepair"
    # Index each doc's REVERSED sequence (reference `--reversed`,
    # indexing_v6_sharded.py:49); emitted ranges are mapped back to
    # forward coordinates.
    reverse: bool = False
    # Partition-scan kernel: "hash" (default) groups minlen-windows by a
    # canonical rolling hash + one radix sort — byte-identical output to
    # the SA path, ~3-4x faster (functions/scan.find_remove_ranges_hashed);
    # "sa" builds the full suffix array (the reference's formulation,
    # kept as the independent cross-check and for SA-consuming
    # diagnostics).
    scan_kernel: str = "hash"

    # --- partitioning ----------------------------------------------------
    # Number of order-contiguous corpus partitions (reference: shards =
    # cpus x num_batches). Partition assignment MUST be contiguous in
    # doc_seq so that (partition, byte_offset) order == global doc order
    # (keep-first semantics, reference cpp_engine_dedup.h:717-724).
    num_partitions: int = 8
    # Soft cap on per-partition corpus bytes when num_partitions == 0
    # (auto): partitions = total_text_bytes / this. The numpy suffix-array
    # build is cache-bound and measures fastest at 1-4 MB partitions
    # (7.5 MB partitions scanned 4x slower than 1.9 MB at equal total
    # bytes); a compiled SA builder would move the sweet spot up to the
    # reference's 100 MB-class shards — this is THE knob to retune then.
    target_partition_bytes: int = 2 * 1024 * 1024

    # --- column names ----------------------------------------------------
    id_col: str = "url"          # document identity (unique)
    text_col: str = "text"       # utf-8 text payload
    seq_col: str = "doc_seq"     # global total-order key (int64); derived if absent

    # --- MinHash / LSH cross-partition routing ---------------------------
    # Signature config: 128 perms in 16 bands of 8 rows is the standard
    # LSH operating point for ~0.8 Jaccard threshold.
    num_perm: int = 128
    num_bands: int = 16
    shingle_k: int = 16          # byte-shingle width for MinHash
    minhash_seed: int = 42
    # One-Permutation Hashing (one stream pass; ~2x faster emit) vs k
    # independent permutations; estimation error measured equal.
    minhash_oph: bool = True
    # Skew handling (north_rule "skew-aware salting of hot shingles"):
    # a candidate bucket larger than this many docs (a hot shingle /
    # boilerplate band) is CHUNKED into doc_seq-ordered sub-groups that
    # each carry the bucket's global keep-first representative. Sound for
    # removal: every non-first member's shared window is checked against
    # the earliest occurrence; bounded: no mini-corpus scan or pair fan-
    # out ever exceeds ~max_band_bucket docs.
    max_band_bucket: int = 256
    # Cap on candidate pairs emitted per LSH bucket (pairs are formed
    # against the bucket's doc_seq-minimum representative, so a bucket of
    # n docs emits n-1 pairs, not n^2).
    jaccard_threshold: float = 0.5

    # --- execution -------------------------------------------------------
    batch_size: int = 1024       # rows per map_batches batch for text stages
    cpus_per_index_task: float = 1.0
    # checkpoint / resume
    checkpoint_dir: str | None = None

    # --- bookkeeping -----------------------------------------------------
    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        assert self.mode in ("annotate", "remove"), self.mode
        assert self.token_dtype in ("u8", "u16", "u32"), self.token_dtype
        assert self.scan_kernel in ("hash", "sa"), self.scan_kernel
        assert self.num_perm % self.num_bands == 0, (
            "num_perm must be divisible by num_bands")

    @property
    def rows_per_band(self) -> int:
        return self.num_perm // self.num_bands
