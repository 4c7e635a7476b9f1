"""tpf trajectory store: page-aligned binary format + native loader.

TPU-native data-pipeline hot path (SURVEY.md §2 "Dataset loader" L1).
The reference reads its whole archive into host RAM with Python; that
works at research scale but serializes batch assembly with training
for multi-GB stores. The ``.tpf`` format plus the C++ loader
(``tpuflow/native/loader.cpp``) instead stream windows off disk with
a worker pool, fuse the per-channel normalization into the gather,
and expose an async ticket API so the train loop can double-buffer
(prefetch batch k+1 while batch k is on the TPU).

Format (little-endian)::

    bytes 0:4    magic b"TPF1"
    bytes 4:12   u64 header_len
    bytes 12:..  JSON header: {"lf_shape": [N,T,h,w,C],
                 "hf_shape": [N,T,H,W,C], "dtype": "float32",
                 "lf_offset": ..., "hf_offset": ...}
    arrays       raw float32 C-order, each 4096-byte aligned

The native library is compiled on demand with g++ (cached); when no
compiler is available everything transparently falls back to a
numpy memmap path with identical semantics (async becomes eager).
"""

from __future__ import annotations

import ctypes
import json
import os
import pathlib
import subprocess
import tempfile
import threading

import numpy as np

from tpuflow.data.dataset import NormStats, TrajectoryDataset

_MAGIC = b"TPF1"
_ALIGN = 4096

_lib = None
_lib_lock = threading.Lock()
_lib_failed = False


def save_tpf(path: str | pathlib.Path, lf: np.ndarray, hf: np.ndarray) -> pathlib.Path:
    """Write an (lf, hf) trajectory pair as a .tpf store."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    lf = np.ascontiguousarray(lf, np.float32)
    hf = np.ascontiguousarray(hf, np.float32)
    if lf.ndim != 5 or hf.ndim != 5 or lf.shape[:2] != hf.shape[:2]:
        raise ValueError(f"want aligned 5-D (N,T,...) arrays, got {lf.shape}, {hf.shape}")

    def align(n: int) -> int:
        return (n + _ALIGN - 1) // _ALIGN * _ALIGN

    # Two-pass header: sizes are known, offsets depend on header length.
    head = {
        "lf_shape": list(lf.shape), "hf_shape": list(hf.shape),
        "dtype": "float32", "lf_offset": 0, "hf_offset": 0,
    }
    hlen = len(json.dumps(head).encode()) + 64  # room for offset digits
    lf_off = align(12 + hlen)
    hf_off = align(lf_off + lf.nbytes)
    head["lf_offset"], head["hf_offset"] = lf_off, hf_off
    hjson = json.dumps(head).encode().ljust(hlen, b" ")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(np.uint64(len(hjson)).tobytes())
        f.write(hjson)
        f.seek(lf_off)
        # tofile/memoryview write without materializing a full copy
        # (tobytes() would double peak RAM on the multi-GB stores this
        # format exists for).
        f.write(memoryview(lf).cast("B"))
        f.seek(hf_off)
        f.write(memoryview(hf).cast("B"))
    return path


def _read_header(path: pathlib.Path) -> dict:
    with open(path, "rb") as f:
        if f.read(4) != _MAGIC:
            raise ValueError(f"{path} is not a .tpf store (bad magic)")
        (hlen,) = np.frombuffer(f.read(8), np.uint64)
        return json.loads(f.read(int(hlen)))


def _build_lib() -> ctypes.CDLL | None:
    """Compile and load the native loader (cached per process)."""
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        src = pathlib.Path(__file__).parent.parent / "native" / "loader.cpp"
        # Per-user cache (a fixed world-writable /tmp path would let
        # another user plant a .so that CDLL then executes); compile to
        # a unique temp name and rename so racing processes never load
        # a half-written library.
        cache = (
            pathlib.Path(os.environ.get("XDG_CACHE_HOME", pathlib.Path.home() / ".cache"))
            / "tpuflow" / "native"
        )
        so = cache / "_tpfloader.so"
        try:
            cache.mkdir(parents=True, exist_ok=True)
            if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                with tempfile.NamedTemporaryFile(
                    dir=cache, suffix=".so", delete=False
                ) as tmp:
                    tmp_path = pathlib.Path(tmp.name)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", str(tmp_path), str(src), "-lpthread"],
                    check=True, capture_output=True, text=True,
                )
                tmp_path.replace(so)
            lib = ctypes.CDLL(str(so))
        except (OSError, subprocess.CalledProcessError):
            _lib_failed = True
            return None
        lib.tpf_open.restype = ctypes.c_int64
        lib.tpf_open.argtypes = [ctypes.c_char_p]
        lib.tpf_close.argtypes = [ctypes.c_int64]
        lib.tpf_info.restype = ctypes.c_int
        lib.tpf_info.argtypes = [ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.tpf_read_batch.restype = ctypes.c_int
        lib.tpf_read_batch.argtypes = [
            ctypes.c_int64, ctypes.c_int, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, f32p, f32p, f32p,
        ]
        lib.tpf_read_batch_async.restype = ctypes.c_int64
        lib.tpf_read_batch_async.argtypes = [
            ctypes.c_int64, ctypes.c_int, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, f32p, f32p, f32p,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.tpf_wait.argtypes = [ctypes.c_int64]
        lib.tpf_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def _f32p(a: np.ndarray | None):
    if a is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class _Ticket:
    """Pending async gather; keeps every buffer the C side touches
    alive until the gather completes.

    wait() is idempotent (the C-side Pool::wait consumes its completion
    entry, so only the first call crosses the ABI). __del__ waits too:
    an abandoned ticket (e.g. a prefetching generator that is dropped
    mid-epoch) must NOT free its numpy output buffer while the worker
    thread is still writing into it."""

    def __init__(self, lib, tid, status, keepalive, out, store=None):
        self._lib, self._tid, self._status = lib, tid, status
        self._keepalive, self.out = keepalive, out
        self._store = store
        self._done = lib is None

    def wait(self) -> np.ndarray:
        if not self._done:
            self._done = True
            self._lib.tpf_wait(self._tid)
            # Deregister only AFTER the native wait returns: removing
            # the ticket first would let TPFStore.close()'s drain see
            # an empty pending set while this gather is still running
            # and free the C-side store under it.
            if self._store is not None:
                self._store._pending.discard(self)
            if self._status.value != 0:
                raise IOError("native gather failed")
        return self.out

    def __del__(self):
        try:
            self.wait()
        except Exception:
            pass


class TPFStore:
    """Window/batch reader over a .tpf store (native when possible).

    Normalization: pass per-channel ``mean``/``std`` to fuse
    ``(x - mean) / std`` into the gather.
    """

    def __init__(self, path: str | pathlib.Path, use_native: bool = True):
        self.path = pathlib.Path(path)
        self._pending: set = set()  # in-flight tickets (drained on close)
        head = _read_header(self.path)
        self.lf_shape = tuple(head["lf_shape"])
        self.hf_shape = tuple(head["hf_shape"])
        self._offsets = (head["lf_offset"], head["hf_offset"])
        self._lib = _build_lib() if use_native else None
        self._handle = 0
        if self._lib is not None:
            self._handle = self._lib.tpf_open(str(self.path).encode())
            if self._handle == 0:
                raise IOError(
                    f"native open failed: {self._lib.tpf_last_error().decode()}"
                )
            info = (ctypes.c_int64 * 10)()
            self._lib.tpf_info(self._handle, info)
            assert tuple(info[:5]) == self.lf_shape, "header/native mismatch"
        else:  # numpy memmap fallback
            self._mm = [
                np.memmap(self.path, np.float32, "r",
                          offset=self._offsets[i], shape=shape)
                for i, shape in enumerate((self.lf_shape, self.hf_shape))
            ]

    @property
    def native(self) -> bool:
        return self._lib is not None

    @property
    def n_traj(self) -> int:
        return self.lf_shape[0]

    @property
    def n_steps(self) -> int:
        return self.lf_shape[1]

    def close(self) -> None:
        # Drain in-flight gathers first: tpf_close frees the C-side
        # Store while a worker could still be pread()ing from it.
        for t in list(self._pending):
            try:
                t.wait()
            except IOError:
                pass
        if self._lib is not None and self._handle:
            self._lib.tpf_close(self._handle)
            self._handle = 0

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _norm_arrays(self, mean, std, c):
        if mean is None:
            return None, None
        mean = np.ascontiguousarray(mean, np.float32).reshape(c)
        inv = np.ascontiguousarray(
            1.0 / np.asarray(std, np.float32), np.float32
        ).reshape(c)
        return mean, inv

    def read_batch(
        self, which: str, traj_ids, t0: int, t1: int, mean=None, std=None
    ) -> np.ndarray:
        """Gather windows [t0,t1) of ``traj_ids`` -> (B, t1-t0, H, W, C)."""
        w = 0 if which == "lf" else 1
        shape = (self.lf_shape, self.hf_shape)[w]
        ids = np.ascontiguousarray(traj_ids, np.int64)
        out = np.empty((len(ids), t1 - t0, *shape[2:]), np.float32)
        mean, inv = self._norm_arrays(mean, std, shape[4])
        if self._lib is None:
            out[:] = self._mm[w][ids, t0:t1]
            if mean is not None:
                out -= mean
                out *= inv
            return out
        rc = self._lib.tpf_read_batch(
            self._handle, w, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(ids), t0, t1, _f32p(mean), _f32p(inv), _f32p(out),
        )
        if rc != 0:
            raise IOError(f"tpf_read_batch failed (rc={rc})")
        return out

    def read_batch_async(
        self, which: str, traj_ids, t0: int, t1: int, mean=None, std=None
    ) -> _Ticket:
        """Async read_batch; returns a ticket whose .wait() yields the
        array. Falls back to an eager read without the native lib."""
        w = 0 if which == "lf" else 1
        shape = (self.lf_shape, self.hf_shape)[w]
        if self._lib is None:
            out = self.read_batch(which, traj_ids, t0, t1, mean, std)
            return _Ticket(None, 0, None, (), out)
        ids = np.ascontiguousarray(traj_ids, np.int64)
        out = np.empty((len(ids), t1 - t0, *shape[2:]), np.float32)
        mean, inv = self._norm_arrays(mean, std, shape[4])
        status = ctypes.c_int(1)
        tid = self._lib.tpf_read_batch_async(
            self._handle, w, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(ids), t0, t1, _f32p(mean), _f32p(inv), _f32p(out),
            ctypes.byref(status),
        )
        ticket = _Ticket(self._lib, tid, status, (ids, mean, inv), out, self)
        self._pending.add(ticket)
        return ticket


class PrefetchingWindowLoader:
    """Epoch iterator over (lf_win, hf_win) BPTT windows with
    double-buffered native prefetch.

    Matches ``TrajectoryDataset.traj_batches`` + ``windows`` semantics
    (shuffled whole-trajectory batches, consecutive windows within a
    batch so recurrent state can carry) while the next window pair is
    gathered off disk during the current step's device time. Yields
    ``(lf, hf, first_window)`` with batch-major (B, W, h, w, C) f32.
    """

    def __init__(
        self,
        store: TPFStore,
        window: int,
        batch_size: int,
        norm,  # NormStats
        drop_remainder: bool = True,
    ):
        if drop_remainder and store.n_traj < batch_size:
            raise ValueError(
                f"batch_size={batch_size} exceeds the store's "
                f"{store.n_traj} trajectories"
            )
        self.store, self.window, self.batch_size = store, window, batch_size
        self.norm = norm
        self.drop_remainder = drop_remainder

    # Epoch order comes from the shared single source of truth
    # (dataset.py batch_indices) — re-implementing the shuffle here
    # could silently drift from the ram/resident loaders' order and
    # break deterministic cross-loader parity.
    batch_indices = TrajectoryDataset.batch_indices

    @property
    def n_traj(self) -> int:  # for batch_indices
        return self.store.n_traj

    def _schedule(self, seed: int):
        t = self.store.n_steps
        for ids in self.batch_indices(seed, self.batch_size, self.drop_remainder):
            for w0 in range(0, t - self.window + 1, self.window):
                yield ids, w0, w0 == 0

    def epoch(self, seed: int):
        def issue(item):
            ids, w0, first = item
            n = self.norm
            return (
                self.store.read_batch_async(
                    "lf", ids, w0, w0 + self.window, n.lf_mean, n.lf_std
                ),
                self.store.read_batch_async(
                    "hf", ids, w0, w0 + self.window, n.hf_mean, n.hf_std
                ),
                first,
            )

        pending = None
        for item in self._schedule(seed):
            nxt = issue(item)
            if pending is not None:
                lf_t, hf_t, first = pending
                yield lf_t.wait(), hf_t.wait(), first
            pending = nxt
        if pending is not None:
            lf_t, hf_t, first = pending
            yield lf_t.wait(), hf_t.wait(), first


def compute_norm_streaming(store: TPFStore, chunk: int = 4) -> NormStats:
    """Per-channel NormStats over a store without loading it into RAM
    (chunked f64 moment accumulation; matches NormStats.from_data to
    float precision, including its +1e-8 std floor)."""
    sums = {}
    for which, c in (("lf", store.lf_shape[4]), ("hf", store.hf_shape[4])):
        s = np.zeros(c, np.float64)
        s2 = np.zeros(c, np.float64)
        n = 0
        for i in range(0, store.n_traj, chunk):
            ids = np.arange(i, min(i + chunk, store.n_traj))
            x = store.read_batch(which, ids, 0, store.n_steps)
            flat = x.reshape(-1, c).astype(np.float64)
            s += flat.sum(0)
            s2 += (flat * flat).sum(0)
            n += flat.shape[0]
        mean = s / n
        var = np.maximum(s2 / n - mean * mean, 0.0)
        sums[which] = (
            mean.astype(np.float32),
            (np.sqrt(var) + 1e-8).astype(np.float32),
        )
    return NormStats(
        lf_mean=sums["lf"][0], lf_std=sums["lf"][1],
        hf_mean=sums["hf"][0], hf_std=sums["hf"][1],
    )


class StreamingTrajectoryDataset:
    """Drop-in trainer dataset backed by a .tpf store.

    Same interface as :class:`tpuflow.data.dataset.TrajectoryDataset`
    (traj_batches / windows / norm / denorm_*), but trajectory batches
    are gathered off disk by the native loader with the normalization
    fused into the copy, and the NEXT batch is prefetched (async
    ticket) while the trainer runs the current one on the TPU — host
    RAM stays O(batch), not O(dataset). Training-side only: the eval
    paths want whole in-RAM splits (use TrajectoryDataset there).
    """

    def __init__(self, store: TPFStore, norm: NormStats | None = None):
        self.store = store
        self._norm = norm

    @property
    def norm(self) -> NormStats:
        """Normalization constants — computed lazily (one full streamed
        pass) only if none were provided or assigned. The trainer
        assigns the checkpointed constants on resume BEFORE any batch
        is drawn, so a resumed run never pays the O(dataset) sweep."""
        if self._norm is None:
            self._norm = compute_norm_streaming(self.store)
        return self._norm

    @norm.setter
    def norm(self, value: NormStats) -> None:
        self._norm = value

    @property
    def n_traj(self) -> int:
        return self.store.n_traj

    @property
    def n_steps(self) -> int:
        return self.store.n_steps

    # Same physical-unit helpers as TrajectoryDataset.
    def denorm_hf(self, x):
        return x * self.norm.hf_std + self.norm.hf_mean

    def denorm_hf_var(self, var):
        return var * self.norm.hf_std**2

    def denorm_lf(self, x):
        return x * self.norm.lf_std + self.norm.lf_mean

    # Shared epoch-order source (dataset.py contract: batch_indices is
    # the single source of truth — ram/resident/stream training must
    # shuffle identically for deterministic cross-loader parity).
    batch_indices = TrajectoryDataset.batch_indices

    def traj_batches(self, seed: int, batch_size: int, drop_remainder: bool = True):
        """Shuffled whole-trajectory (lf, hf) batches, normalized,
        double-buffered through the native loader."""
        n = self.norm

        def issue(ids):
            return (
                self.store.read_batch_async(
                    "lf", ids, 0, self.n_steps, n.lf_mean, n.lf_std
                ),
                self.store.read_batch_async(
                    "hf", ids, 0, self.n_steps, n.hf_mean, n.hf_std
                ),
            )

        pending = None
        for ids in self.batch_indices(seed, batch_size, drop_remainder):
            nxt = issue(ids)
            if pending is not None:
                yield pending[0].wait(), pending[1].wait()
            pending = nxt
        if pending is not None:
            yield pending[0].wait(), pending[1].wait()

    # Shared BPTT window slicer (identical semantics to the RAM path).
    windows = staticmethod(TrajectoryDataset.windows)
