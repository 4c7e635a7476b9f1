"""Native .tpf trajectory store: format roundtrip, native vs numpy
parity, fused normalization, async prefetch, loader equivalence with
the in-RAM TrajectoryDataset pipeline."""

import numpy as np
import pytest

from tpuflow.data import NormStats, TrajectoryDataset
from tpuflow.data.tpf import (
    PrefetchingWindowLoader,
    TPFStore,
    _build_lib,
    save_tpf,
)

N, T, C = 5, 12, 3
LF_HW, HF_HW = (4, 8), (8, 16)


@pytest.fixture(scope="module")
def arrays():
    rng = np.random.default_rng(0)
    lf = rng.normal(size=(N, T, *LF_HW, C)).astype(np.float32)
    hf = rng.normal(loc=1.5, scale=2.0, size=(N, T, *HF_HW, C)).astype(
        np.float32
    )
    return lf, hf


@pytest.fixture()
def store_path(arrays, tmp_path):
    return save_tpf(tmp_path / "case_train.tpf", *arrays)


def test_native_lib_compiles():
    """g++ is in the image: the C++ loader must actually build."""
    assert _build_lib() is not None


@pytest.mark.parametrize("use_native", [True, False])
def test_roundtrip_and_windows(arrays, store_path, use_native):
    lf, hf = arrays
    with TPFStore(store_path, use_native=use_native) as s:
        assert s.native == use_native
        assert (s.n_traj, s.n_steps) == (N, T)
        got = s.read_batch("hf", [3, 0], 2, 7)
        np.testing.assert_array_equal(got, hf[[3, 0], 2:7])
        got = s.read_batch("lf", np.arange(N), 0, T)
        np.testing.assert_array_equal(got, lf)


@pytest.mark.parametrize("use_native", [True, False])
def test_fused_normalization(arrays, store_path, use_native):
    lf, hf = arrays
    norm = NormStats.from_data(lf, hf)
    with TPFStore(store_path, use_native=use_native) as s:
        got = s.read_batch("hf", [1, 4], 0, T, norm.hf_mean, norm.hf_std)
    want = (hf[[1, 4]] - norm.hf_mean) / norm.hf_std
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_async_matches_sync(arrays, store_path):
    lf, _ = arrays
    with TPFStore(store_path) as s:
        tickets = [
            s.read_batch_async("lf", [i, (i + 2) % N], 1, 9)
            for i in range(N)
        ]
        for i, t in enumerate(tickets):
            np.testing.assert_array_equal(
                t.wait(), lf[[i, (i + 2) % N], 1:9]
            )


def test_prefetching_loader_matches_dataset(arrays, store_path):
    """The streaming loader yields byte-identical windows, in the same
    order, as TrajectoryDataset.traj_batches + windows."""
    lf, hf = arrays
    ds = TrajectoryDataset(lf, hf)  # normalizes in RAM
    window, batch, seed = 4, 2, 7

    with TPFStore(store_path) as s:
        loader = PrefetchingWindowLoader(s, window, batch, ds.norm)
        stream = list(loader.epoch(seed))

    expect = []
    for lf_b, hf_b in ds.traj_batches(seed, batch):
        for i, (lf_w, hf_w) in enumerate(
            TrajectoryDataset.windows(lf_b, hf_b, window)
        ):
            expect.append((lf_w, hf_w, i == 0))

    assert len(stream) == len(expect) > 0
    for (lf_g, hf_g, f_g), (lf_e, hf_e, f_e) in zip(stream, expect):
        assert f_g == f_e
        np.testing.assert_allclose(lf_g, lf_e, atol=1e-6)
        np.testing.assert_allclose(hf_g, hf_e, atol=1e-6)


def test_load_archive_tpf(arrays, store_path):
    from tpuflow.data.dataset import load_archive

    lf, hf = arrays
    lf2, hf2 = load_archive(store_path)
    np.testing.assert_array_equal(lf2, lf)
    np.testing.assert_array_equal(hf2, hf)


def test_convert_tpf_cli(arrays, tmp_path):
    from tpuflow.data.dataset import save_archive
    from tpuflow.tools.convert_tpf import main

    lf, hf = arrays
    src = tmp_path / "a.npz"
    save_archive(src, lf, hf)
    dst = tmp_path / "a.tpf"
    assert main([str(src), str(dst)]) == 0
    with TPFStore(dst) as s:
        np.testing.assert_array_equal(s.read_batch("hf", [0], 0, T)[0], hf[0])


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "x.tpf"
    p.write_bytes(b"NOPE" + b"\0" * 64)
    with pytest.raises(ValueError, match="bad magic"):
        TPFStore(p)


def test_streaming_dataset_matches_ram(arrays, store_path):
    """StreamingTrajectoryDataset yields the same normalized batches
    (same shuffle, same normalization) as the in-RAM dataset."""
    from tpuflow.data.tpf import StreamingTrajectoryDataset, compute_norm_streaming

    lf, hf = arrays
    ram = TrajectoryDataset(lf, hf)
    with TPFStore(store_path) as s:
        norm = compute_norm_streaming(s)
        np.testing.assert_allclose(norm.hf_mean, ram.norm.hf_mean, atol=1e-5)
        np.testing.assert_allclose(norm.hf_std, ram.norm.hf_std, rtol=1e-5)
        stream = StreamingTrajectoryDataset(s, norm=ram.norm)
        assert (stream.n_traj, stream.n_steps) == (ram.n_traj, ram.n_steps)
        got = list(stream.traj_batches(3, 2))
        want_idx = list(ram.traj_batches(3, 2))
        assert len(got) == len(want_idx) > 0
        for (lf_g, hf_g), (lf_w, hf_w) in zip(got, want_idx):
            np.testing.assert_allclose(lf_g, lf_w, atol=1e-6)
            np.testing.assert_allclose(hf_g, hf_w, atol=1e-6)
        # Shared windows slicer.
        w = list(stream.windows(got[0][0], got[0][1], 4))
        assert len(w) == T // 4
        # Physical-unit helpers roundtrip.
        np.testing.assert_allclose(
            stream.denorm_hf(got[0][1][:, 0]),
            ram.denorm_hf(want_idx[0][1][:, 0]),
            atol=1e-5,
        )


@pytest.mark.slow  # 20s+ on the 1-core bench host
def test_train_with_streaming_loader(arrays, tmp_path):
    """End-to-end: two training epochs off a .tpf store through the
    native streaming loader (data.loader=stream)."""
    from tpuflow.cli.train import main as train_main

    lf, hf = arrays
    data_dir = tmp_path / "datasets"
    save_tpf(data_dir / "backward-step_train.tpf", lf, hf)
    metrics = train_main([
        "backward-step",
        "data.synthetic=false",
        "data.loader=stream",
        f"data.data_dir={data_dir}",
        "data.window=4",
        "data.batch_size=2",
        "train.epochs=2",
        "train.checkpoint_every=2",
        f"train.checkpoint_dir={tmp_path / 'ckpt'}",
        "model.hf_shape=(8,16)",
        "model.lf_shape=(4,8)",
        "model.n_scales=2",
        "model.n_flow_steps=2",
        "model.coupling_width=8",
        "model.coupling_layers=2",
        "model.growth_rate=4",
        "model.encoder_width=8",
        "model.lstm_hidden=8",
        "model.cond_channels=8",
        "model.compute_dtype=float32",
    ])
    assert np.isfinite(metrics["mean_bpd"])
    assert metrics["epoch"] == 2  # completed-epoch count


def test_ticket_double_wait_and_abandoned_generator(arrays, store_path):
    """wait() is idempotent; dropping a prefetching generator mid-epoch
    (in-flight tickets abandoned) then closing the store is safe."""
    lf, _ = arrays
    with TPFStore(store_path) as s:
        t = s.read_batch_async("lf", [0], 0, 4)
        a = t.wait()
        b = t.wait()  # second wait must not deadlock
        assert a is b
        from tpuflow.data.tpf import StreamingTrajectoryDataset
        from tpuflow.data import NormStats

        ds = StreamingTrajectoryDataset(s, norm=NormStats.from_data(*arrays))
        gen = ds.traj_batches(0, 2)
        next(gen)  # leaves the prefetched next batch in flight
        del gen    # abandoned generator must not free in-flight buffers
    # store closed with pending drained; a fresh read still works
    with TPFStore(store_path) as s2:
        np.testing.assert_array_equal(
            s2.read_batch("lf", [1], 0, 3)[0], lf[1, :3]
        )


def test_stream_loader_finds_tpf_next_to_h5(arrays, tmp_path):
    """data.loader=stream must pick up the .tpf even when the source
    .h5 archive is still in the same directory (documented workflow)."""
    from tpuflow.configs.config import load_case
    from tpuflow.data.dataset import load_dataset, save_archive
    from tpuflow.data.tpf import StreamingTrajectoryDataset

    lf, hf = arrays
    data_dir = tmp_path / "d"
    save_archive(data_dir / "backward-step_train.h5", lf, hf)
    save_tpf(data_dir / "backward-step_train.tpf", lf, hf)
    cfg = load_case("backward-step", {
        "data.synthetic": False, "data.loader": "stream",
        "data.data_dir": str(data_dir),
    })
    ds = load_dataset(cfg.data, cfg.model, "train")
    assert isinstance(ds, StreamingTrajectoryDataset)
    # Missing .tpf gives an actionable error even though .h5 exists.
    (data_dir / "backward-step_train.tpf").unlink()
    with pytest.raises(FileNotFoundError, match="convert_tpf"):
        load_dataset(cfg.data, cfg.model, "train")


def test_streaming_norm_lazy_and_assignable(arrays, store_path, monkeypatch):
    """Assigning norm (trainer resume path) must skip the O(dataset)
    normalization sweep entirely."""
    import tpuflow.data.tpf as tpf_mod
    from tpuflow.data import NormStats

    def boom(store, chunk=4):
        raise AssertionError("norm sweep must not run")

    monkeypatch.setattr(tpf_mod, "compute_norm_streaming", boom)
    with TPFStore(store_path) as s:
        ds = tpf_mod.StreamingTrajectoryDataset(s)
        ds.norm = NormStats.from_data(*arrays)
        next(ds.traj_batches(0, 2))  # works without any sweep


def test_window_loader_keeps_remainder(arrays, store_path):
    from tpuflow.data import NormStats

    lf, hf = arrays
    norm = NormStats.from_data(lf, hf)
    with TPFStore(store_path) as s:
        keep = PrefetchingWindowLoader(s, 4, 2, norm, drop_remainder=False)
        drop = PrefetchingWindowLoader(s, 4, 2, norm, drop_remainder=True)
        n_keep = sum(b[0].shape[0] for b in keep.epoch(0) if b[2])
        n_drop = sum(b[0].shape[0] for b in drop.epoch(0) if b[2])
        assert n_keep == N and n_drop == (N // 2) * 2


def test_ensemble_crps_rejects_single_member():
    from tpuflow.eval import ensemble_crps
    import jax.numpy as jnp

    with pytest.raises(ValueError, match=">= 2 members"):
        ensemble_crps(jnp.zeros((1, 4)), jnp.zeros((4,)))


def test_native_close_with_inflight_gathers(arrays, store_path):
    """Racing tpf_close against in-flight/queued async gathers must be
    memory-safe: close blocks until running readers drain (C-side
    refcount) and queued tasks that lose the race fail cleanly (-2 ->
    IOError) instead of touching freed memory. Every ticket resolves —
    either with correct bytes or a clean error — and nothing crashes."""
    import threading

    lf, hf = arrays
    s = TPFStore(store_path)
    if not s.native:
        pytest.skip("native loader unavailable")
    tickets = [
        s.read_batch_async("hf", [i % N], 0, T) for i in range(64)
    ]
    # Bypass the Python-side drain to exercise the C-side safety net.
    closer = threading.Thread(target=s._lib.tpf_close, args=(s._handle,))
    closer.start()
    ok = failed = 0
    for i, t in enumerate(tickets):
        try:
            out = t.wait()
            np.testing.assert_allclose(out[0], hf[i % N], rtol=1e-6)
            ok += 1
        except IOError:
            failed += 1
    closer.join()
    s._handle = 0  # already closed directly
    s._pending.clear()
    assert ok + failed == 64
