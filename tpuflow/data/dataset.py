"""Trajectory dataset: normalization, trajectory batching, BPTT windows.

Parity: SURVEY.md §2 "Dataset loader" / §3.1 — the training hot loop
iterates trajectory batches, and within a batch iterates *consecutive*
time windows so ConvLSTM state carries across windows (truncated BPTT);
the evaluator consumes whole trajectories. Normalization is per-channel
mean/std computed over the training split and applied identically at
train and eval time (reference behaviour: constants stored with the
dataset).

Archive format (real data): a single ``.h5``/``.hdf5`` file or ``.npz``
per split with datasets ``lf`` (N, T, h, w, C) and ``hf``
(N, T, H, W, C). This is the format-discovery fallback documented in
SURVEY.md §7 open-unknown 3 — the reference's exact Zenodo layout was
unverifiable offline, so tpuflow defines this contract and ships a
converter hook (`load_archive`) to adapt once real archives are seen.
"""

from __future__ import annotations

import dataclasses
import pathlib
from dataclasses import dataclass

import numpy as np

from tpuflow.configs.config import DataConfig, ModelConfig
from tpuflow.data.synthetic import generate_case


@dataclass(frozen=True)
class NormStats:
    """Per-channel normalization constants (float32 arrays, shape (C,))."""

    lf_mean: np.ndarray
    lf_std: np.ndarray
    hf_mean: np.ndarray
    hf_std: np.ndarray

    @staticmethod
    def from_data(lf: np.ndarray, hf: np.ndarray) -> "NormStats":
        axes = tuple(range(lf.ndim - 1))
        return NormStats(
            lf_mean=lf.mean(axis=axes),
            lf_std=lf.std(axis=axes) + 1e-8,
            hf_mean=hf.mean(axis=axes),
            hf_std=hf.std(axis=axes) + 1e-8,
        )

    def to_dict(self) -> dict:
        return {k: np.asarray(v) for k, v in dataclasses.asdict(self).items()}

    @staticmethod
    def from_dict(d: dict) -> "NormStats":
        return NormStats(**{k: np.asarray(v) for k, v in d.items()})


class TrajectoryDataset:
    """Aligned (LF, HF) trajectories with train-time windowing.

    Arrays are held normalized; `denorm_hf` maps model outputs back to
    physical units for the physics statistics (SURVEY.md §2 "Physics
    statistics").
    """

    def __init__(self, lf: np.ndarray, hf: np.ndarray, norm: NormStats | None = None):
        assert lf.ndim == 5 and hf.ndim == 5, (lf.shape, hf.shape)
        assert lf.shape[:2] == hf.shape[:2], (lf.shape, hf.shape)
        self.norm = norm or NormStats.from_data(lf, hf)
        self.lf = ((lf - self.norm.lf_mean) / self.norm.lf_std).astype(np.float32)
        self.hf = ((hf - self.norm.hf_mean) / self.norm.hf_std).astype(np.float32)

    @property
    def n_traj(self) -> int:
        return self.lf.shape[0]

    @property
    def n_steps(self) -> int:
        return self.lf.shape[1]

    def denorm_hf(self, x: np.ndarray) -> np.ndarray:
        """Normalized HF FIELD -> physical units (affine)."""
        return x * self.norm.hf_std + self.norm.hf_mean

    def denorm_hf_var(self, var: np.ndarray) -> np.ndarray:
        """Normalized HF VARIANCE -> physical units. Variances scale by
        sigma^2 and do NOT shift by the mean — using denorm_hf on a
        variance field corrupts TKE by the mean flow."""
        return var * self.norm.hf_std**2

    def denorm_lf(self, x: np.ndarray) -> np.ndarray:
        """Normalized LF FIELD -> physical units (affine)."""
        return x * self.norm.lf_std + self.norm.lf_mean

    def batch_indices(self, seed: int, batch_size: int, drop_remainder: bool = True):
        """Yield shuffled trajectory-index batches — the single source
        of truth for epoch order (shared by the host-upload path, the
        device-resident gather path, and tests asserting determinism)."""
        if drop_remainder and self.n_traj < batch_size:
            raise ValueError(
                f"batch_size={batch_size} exceeds the dataset's "
                f"{self.n_traj} trajectories: zero batches per epoch"
            )
        order = np.random.default_rng(seed).permutation(self.n_traj)
        for i in range(0, len(order) - (batch_size - 1 if drop_remainder else 0), batch_size):
            yield order[i : i + batch_size]

    def traj_batches(self, seed: int, batch_size: int, drop_remainder: bool = True):
        """Yield (lf, hf) trajectory batches (B, T, ...), shuffled.

        Batches are whole trajectories; the caller slices consecutive
        BPTT windows from them so recurrent state can carry across
        windows within a batch (SURVEY.md §3.1 hot loop).
        """
        for idx in self.batch_indices(seed, batch_size, drop_remainder):
            yield self.lf[idx], self.hf[idx]

    @staticmethod
    def windows(lf_batch: np.ndarray, hf_batch: np.ndarray, window: int):
        """Slice a trajectory batch into consecutive (lf_win, hf_win)
        windows of length ``window`` (time-major handled by the train
        step). Trailing partial windows are dropped — scan needs static
        shapes (XLA semantics)."""
        t = lf_batch.shape[1]
        if window > t:
            # range() below would be empty: whole "successful" epochs
            # with zero gradient updates and untouched parameters.
            raise ValueError(
                f"data.window={window} exceeds the trajectory length "
                f"{t} — no BPTT window fits; shrink data.window or "
                "lengthen data.train_steps"
            )
        for w0 in range(0, t - window + 1, window):
            yield lf_batch[:, w0 : w0 + window], hf_batch[:, w0 : w0 + window]


def load_archive(path: str | pathlib.Path) -> tuple[np.ndarray, np.ndarray]:
    """Read an (lf, hf) trajectory archive (.h5/.hdf5, .npz or .tpf)."""
    path = pathlib.Path(path)
    if path.suffix in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "r") as f:
            return np.asarray(f["lf"]), np.asarray(f["hf"])
    if path.suffix == ".npz":
        with np.load(path) as f:
            return f["lf"], f["hf"]
    if path.suffix == ".tpf":
        from tpuflow.data.tpf import TPFStore

        with TPFStore(path) as store:
            return (
                store.read_batch("lf", np.arange(store.n_traj), 0, store.n_steps),
                store.read_batch("hf", np.arange(store.n_traj), 0, store.n_steps),
            )
    raise ValueError(f"unsupported archive {path} (want .h5/.hdf5/.npz/.tpf)")


def save_archive(path: str | pathlib.Path, lf: np.ndarray, hf: np.ndarray) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.suffix in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "w") as f:
            f.create_dataset("lf", data=lf, compression="gzip")
            f.create_dataset("hf", data=hf, compression="gzip")
        return
    if path.suffix == ".npz":
        np.savez_compressed(path, lf=lf, hf=hf)
        return
    if path.suffix == ".tpf":
        from tpuflow.data.tpf import save_tpf

        save_tpf(path, lf, hf)
        return
    raise ValueError(f"unsupported archive {path} (want .h5/.hdf5/.npz/.tpf)")


def load_dataset(
    data_cfg: DataConfig,
    model_cfg: ModelConfig,
    split: str = "train",
    norm: NormStats | None = None,
) -> TrajectoryDataset:
    """Build the dataset for a split per config.

    Synthetic mode generates deterministically from the config seed
    (train/test use disjoint seeds); archive mode reads
    ``{data_dir}/{case}_{split}.h5|.npz``.

    Normalization: pass ``norm`` to use explicit constants (e.g. the
    ones stored in a checkpoint — authoritative at eval time, and it
    skips loading the train split just to recompute statistics);
    otherwise the train split's constants are computed and reused for
    every split (reference behaviour).
    """
    if data_cfg.synthetic:
        n = data_cfg.n_train_traj if split == "train" else data_cfg.n_test_traj
        seed = data_cfg.seed if split == "train" else data_cfg.seed + 10_000
        lf, hf = generate_case(
            data_cfg.case, n, data_cfg.train_steps,
            model_cfg.hf_shape, model_cfg.lf_shape, seed=seed,
            fixture_version=data_cfg.fixture_version,
        )
        if norm is None and split != "train":
            lf_tr, hf_tr = generate_case(
                data_cfg.case, data_cfg.n_train_traj, data_cfg.train_steps,
                model_cfg.hf_shape, model_cfg.lf_shape, seed=data_cfg.seed,
                fixture_version=data_cfg.fixture_version,
            )
            norm = NormStats.from_data(lf_tr, hf_tr)
        return TrajectoryDataset(lf, hf, norm=norm)

    root = pathlib.Path(data_cfg.data_dir)
    if data_cfg.loader == "stream" and split == "train":
        from tpuflow.data.tpf import StreamingTrajectoryDataset, TPFStore

        # Look up the .tpf store directly: the source .h5 it was
        # converted from may legitimately sit in the same directory.
        path = root / f"{data_cfg.case}_train.tpf"
        if not path.exists():
            raise FileNotFoundError(
                f"data.loader=stream needs {path}; convert an archive "
                "with python -m tpuflow.tools.convert_tpf"
            )
        return StreamingTrajectoryDataset(TPFStore(path), norm=norm)
    if data_cfg.loader not in ("ram", "stream"):
        raise ValueError(f"unknown data.loader {data_cfg.loader!r}")
    if norm is None:
        lf_tr, hf_tr = load_archive(_find_archive(root, data_cfg.case, "train"))
        norm = NormStats.from_data(lf_tr, hf_tr)
        if split == "train":
            return TrajectoryDataset(lf_tr, hf_tr, norm=norm)
    lf, hf = load_archive(_find_archive(root, data_cfg.case, split))
    return TrajectoryDataset(lf, hf, norm=norm)


def _find_archive(root: pathlib.Path, case: str, split: str) -> pathlib.Path:
    for suffix in (".h5", ".hdf5", ".npz", ".tpf"):
        p = root / f"{case}_{split}{suffix}"
        if p.exists():
            return p
    raise FileNotFoundError(
        f"no archive {root}/{case}_{split}.(h5|hdf5|npz|tpf); "
        "set data.synthetic=true for the procedural fixture"
    )
