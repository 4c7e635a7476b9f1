"""Data pipeline: trajectory archives, normalization, BPTT windowing.

Parity: SURVEY.md §2 "Dataset loader" (L1) — aligned (LF, HF)
trajectory pairs, per-channel normalization, sliding time-windows for
truncated BPTT, trajectory batching. The synthetic fixture generator
(SURVEY.md §7 step 4) decouples the framework from the unavailable
Zenodo archives while matching their tensor contract.
"""

from tpuflow.data.synthetic import generate_case
from tpuflow.data.dataset import TrajectoryDataset, NormStats, load_dataset
from tpuflow.data.tpf import TPFStore, PrefetchingWindowLoader, save_tpf

__all__ = [
    "generate_case",
    "TrajectoryDataset",
    "NormStats",
    "load_dataset",
    "TPFStore",
    "PrefetchingWindowLoader",
    "save_tpf",
]
