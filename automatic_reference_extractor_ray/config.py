"""Pipeline configuration.

Replaces the reference's ``pathParameter.py`` module-global config
(LOCDB-V3/pathParameter.py:1-36) and the scattered numeric constants in
``imgProcessing.py`` with one frozen dataclass passed to every stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractConfig:
    # Detection thresholds — LOCDB-V3/imgProcessing.py:22 (column 0.91),
    # :659 (reference 0.75), :697 (line IoU 0.03), :660/:741 (group IoU 0.5),
    # :420 (near-dup Levenshtein < 10).
    column_confidence_threshold: float = 0.91
    ref_confidence_threshold: float = 0.75
    line_merge_iou: float = 0.03
    group_accept_iou: float = 0.5
    near_dup_max_distance: int = 10

    # HTML extraction minimum reference length — LOCDB-V3/xmlProcessing.py:217-264
    # (``len(temp_string.strip()) > 5`` in every selector family).
    min_ref_len: int = 5

    # Ray stage sizing.  Text/markup stages are cheap and vectorized →
    # large batches; the extraction actor stage does real per-page work →
    # batches sized so one task is ~100ms-1s (load-balances, no
    # straggling task) while per-task overhead stays amortized.
    # ocr_concurrency None → fixed pool sized from cluster CPUs at
    # pipeline build (pipelines/extract.py:_pool_size).
    # None → batch = block (task granularity == reader block
    # granularity; see pipelines/extract.py on fusion + bundling).
    text_batch_size: int | None = None
    ocr_batch_size: int | None = None
    ocr_concurrency: int | tuple[int, int] | None = None
    ocr_num_cpus: float = 1.0

    # Cost model for skew rebalancing (SURVEY.md §4): estimated cost of a
    # work unit = len(text) + media_cost_bytes per media span.
    media_cost_bytes: int = 20_000
    target_block_cost: int = 8_000_000

    # Output partitioning for resumable writes (state/lineage.py).
    num_resume_partitions: int = 16


DEFAULT_CONFIG = ExtractConfig()
