"""Data pipeline tests: synthetic fixture contract, normalization,
windowing, archive roundtrip (SURVEY.md §4)."""

import numpy as np
import pytest

from tpuflow.configs.config import DataConfig, ModelConfig
from tpuflow.data import TrajectoryDataset, generate_case, load_dataset
from tpuflow.data.dataset import load_archive, save_archive


def test_generate_case_shapes_and_determinism():
    lf, hf = generate_case("backward-step", 2, 8, (32, 64), (8, 16), seed=1)
    assert lf.shape == (2, 8, 8, 16, 3)
    assert hf.shape == (2, 8, 32, 64, 3)
    assert lf.dtype == np.float32 and hf.dtype == np.float32
    lf2, hf2 = generate_case("backward-step", 2, 8, (32, 64), (8, 16), seed=1)
    np.testing.assert_array_equal(lf, lf2)
    np.testing.assert_array_equal(hf, hf2)
    # Trajectories differ (varying Reynolds-like params).
    assert not np.allclose(hf[0], hf[1])
    # Time evolves.
    assert not np.allclose(hf[0, 0], hf[0, 1])


def test_lf_correlates_with_hf():
    """The multi-fidelity contract: LF is a degraded-but-correlated
    rendering of HF (otherwise there is nothing to condition on)."""
    lf, hf = generate_case("cylinder-array", 1, 4, (32, 64), (8, 16), seed=2)
    hf_pooled = hf.reshape(1, 4, 8, 4, 16, 4, 3).mean(axis=(3, 5))
    u_corr = np.corrcoef(lf[..., 0].ravel(), hf_pooled[..., 0].ravel())[0, 1]
    assert u_corr > 0.8, u_corr


def test_backward_step_geometry_mask():
    _, hf = generate_case("backward-step", 1, 2, (32, 64), (8, 16), seed=0)
    # Solid step region (x<0.5 of [0,4) domain, y<0.5 of [0,1)): zero velocity.
    assert np.all(hf[:, :, :16, :8, :2] == 0.0)


def test_unknown_case_raises():
    with pytest.raises(ValueError, match="unknown case"):
        generate_case("bogus", 1, 2, (16, 16), (4, 4))


def test_fixture_v2_phase_error_grows():
    """v2 contract (VERDICT r1 item 4): the LF trajectory is a coarse
    re-run whose phase error GROWS over the trajectory — early frames
    track HF closely, late frames have drifted — while HF itself is
    identical to v1 (same vortex identities and phases)."""
    T = 48
    lf1, hf1 = generate_case("backward-step", 1, T, (32, 64), (8, 16), seed=5)
    lf2, hf2 = generate_case(
        "backward-step", 1, T, (32, 64), (8, 16), seed=5, fixture_version=2
    )
    np.testing.assert_array_equal(hf1, hf2)
    assert not np.allclose(lf1, lf2)

    # Per-timestep correlation of the v channel (pure vortex signal, no
    # mean profile) between LF and average-pooled HF.
    hf_pooled = hf2.reshape(1, T, 8, 4, 16, 4, 3).mean(axis=(3, 5))

    def v_corr(lf, t):
        a, b = lf[0, t, ..., 1].ravel(), hf_pooled[0, t, ..., 1].ravel()
        return np.corrcoef(a, b)[0, 1]

    early = np.mean([v_corr(lf2, t) for t in range(8)])
    late = np.mean([v_corr(lf2, t) for t in range(T - 8, T)])
    assert late < early - 0.1, (early, late)  # phase error accumulates
    # ...but LF stays informative (correlated), not noise.
    assert early > 0.7, early
    # v1 has NO phase error: its late-time correlation stays high.
    late_v1 = np.mean([v_corr(lf1, t) for t in range(T - 8, T)])
    assert late_v1 > 0.9, late_v1


def test_fixture_v2_spectral_truncation():
    """v2 removes LF content above the 0.6-Nyquist cutoff (coarse-mesh
    resolution limit); v1 only damps it."""
    lf1, _ = generate_case("cylinder-array", 1, 4, (32, 64), (8, 16), seed=7)
    lf2, _ = generate_case(
        "cylinder-array", 1, 4, (32, 64), (8, 16), seed=7, fixture_version=2
    )

    def high_k_energy(lf):
        ky = np.fft.fftfreq(lf.shape[2])[:, None] / 0.5
        kx = np.fft.rfftfreq(lf.shape[3])[None, :] / 0.5
        mask = (ky * ky + kx * kx) > 0.6 * 0.6
        spec = np.fft.rfft2(lf, axes=(2, 3))
        return float((np.abs(spec[:, :, mask, :]) ** 2).mean())

    e1, e2 = high_k_energy(lf1), high_k_energy(lf2)
    # The static bias field re-injects a little smooth-noise energy, so
    # "removed" = an order of magnitude below v1, not exactly zero.
    assert e2 < 0.1 * e1, (e1, e2)


def test_fixture_version_validation():
    # v3 exists since r4 (broadband cascade); 4 is the first invalid.
    with pytest.raises(ValueError, match="fixture_version"):
        generate_case("backward-step", 1, 2, (16, 16), (4, 4),
                      fixture_version=4)


def test_dataset_normalization_and_windows():
    lf, hf = generate_case("backward-step", 4, 16, (32, 64), (8, 16), seed=3)
    ds = TrajectoryDataset(lf, hf)
    # Normalized to ~zero mean / unit std per channel.
    np.testing.assert_allclose(ds.hf.mean(axis=(0, 1, 2, 3)), 0.0, atol=1e-4)
    np.testing.assert_allclose(ds.hf.std(axis=(0, 1, 2, 3)), 1.0, atol=1e-3)
    # Denorm roundtrip.
    np.testing.assert_allclose(ds.denorm_hf(ds.hf), hf, atol=1e-3)

    batches = list(ds.traj_batches(seed=0, batch_size=2))
    assert len(batches) == 2
    wins = list(TrajectoryDataset.windows(*batches[0], window=5))
    assert len(wins) == 3  # 16 // 5
    assert wins[0][0].shape == (2, 5, 8, 16, 3)
    # Consecutive windows (state carry contract).
    np.testing.assert_array_equal(wins[1][0], batches[0][0][:, 5:10])
    # window > T must raise, not yield zero windows (a silent
    # zero-update training epoch).
    with pytest.raises(ValueError, match="exceeds the trajectory"):
        list(TrajectoryDataset.windows(*batches[0], window=17))


def test_archive_roundtrip(tmp_path):
    lf, hf = generate_case("backward-step", 1, 2, (16, 32), (4, 8), seed=4)
    for name in ("a.npz", "a.h5"):
        p = tmp_path / name
        save_archive(p, lf, hf)
        lf2, hf2 = load_archive(p)
        np.testing.assert_array_equal(lf, lf2)
        np.testing.assert_array_equal(hf, hf2)


def test_load_dataset_synthetic_split_norm_consistency():
    mc = ModelConfig(hf_shape=(32, 64), lf_shape=(8, 16), n_scales=2)
    dc = DataConfig(synthetic=True, n_train_traj=3, n_test_traj=2,
                    train_steps=4, case="backward-step")
    tr = load_dataset(dc, mc, "train")
    te = load_dataset(dc, mc, "test")
    # Test split uses train-split normalization constants.
    np.testing.assert_array_equal(tr.norm.hf_mean, te.norm.hf_mean)
    assert te.n_traj == 2 and tr.n_traj == 3


def test_download_file_checksum_and_idempotency(tmp_path):
    """download_file streams a URL (file:// here — offline env),
    verifies sha256, is idempotent, and rejects corruption."""
    import hashlib

    from tpuflow.data.download import download_file, sha256_file

    src = tmp_path / "src.npz"
    payload = b"x" * 4096
    src.write_bytes(payload)
    good = hashlib.sha256(payload).hexdigest()
    url = src.as_uri()

    dest = tmp_path / "out" / "a.npz"
    got = download_file(url, dest, sha256=good)
    assert got == dest and dest.read_bytes() == payload
    assert sha256_file(dest) == good
    # Idempotent: second call keeps the verified file.
    assert download_file(url, dest, sha256=good) == dest
    # Wrong checksum on a fresh download raises and leaves nothing.
    bad_dest = tmp_path / "out" / "b.npz"
    with pytest.raises(ValueError, match="sha256 mismatch"):
        download_file(url, bad_dest, sha256="0" * 64)
    assert not bad_dest.exists()


def test_fetch_case_contract_and_sources(tmp_path):
    """fetch_case resolves sources.json, lands the archive at the
    loader's expected path, and validates the (lf, hf) contract."""
    import json

    from tpuflow.data.dataset import save_archive
    from tpuflow.data.download import fetch_case

    lf = np.zeros((2, 3, 4, 8, 3), np.float32)
    hf = np.zeros((2, 3, 8, 16, 3), np.float32)
    hosted = tmp_path / "hosted.npz"
    save_archive(hosted, lf, hf)

    data_dir = tmp_path / "datasets"
    data_dir.mkdir()
    (data_dir / "sources.json").write_text(
        json.dumps(
            {"backward-step": {"train": {"url": hosted.as_uri()}}}
        )
    )
    dest = fetch_case("backward-step", data_dir, split="train")
    assert dest == data_dir / "backward-step_train.npz"

    # Unregistered (case, split) explains how to supply a source.
    with pytest.raises(LookupError, match="no registered source"):
        fetch_case("backward-step", data_dir, split="test")

    # Contract violation is caught at download time.
    bad = tmp_path / "bad.npz"
    np.savez(bad, lf=np.zeros((2, 5, 4, 8, 3)), hf=np.zeros((2, 3, 8, 16, 3)))
    with pytest.raises(ValueError, match="archive contract"):
        fetch_case(
            "cylinder-array", data_dir, split="train", url=bad.as_uri()
        )


def test_fetch_case_strips_query_and_fragment(tmp_path, monkeypatch):
    """URL query strings AND fragments (the '#sha256=...' convention)
    are stripped before deriving the archive extension."""
    import tpuflow.data.download as dl

    seen = {}

    def fake_download(url, dest, sha256=None):
        seen["dest"] = dest
        return dest

    monkeypatch.setattr(dl, "download_file", fake_download)
    monkeypatch.setattr(dl, "_validate_archive", lambda p: None)
    out = dl.fetch_case(
        "backward-step", tmp_path, split="train",
        url="https://host/files/data.h5?download=1#sha256=abcd",
    )
    assert out.name == "backward-step_train.h5"


def test_archive_shapes_without_loading(tmp_path):
    """_archive_shapes reads shapes from metadata only (h5 and npz)."""
    import numpy as np

    from tpuflow.data.dataset import save_archive
    from tpuflow.data.download import _archive_shapes

    lf = np.zeros((2, 3, 4, 8, 3), np.float32)
    hf = np.zeros((2, 3, 8, 16, 3), np.float32)
    for ext in (".h5", ".npz"):
        p = tmp_path / f"a{ext}"
        save_archive(p, lf, hf)
        ls, hs = _archive_shapes(p)
        assert ls == lf.shape and hs == hf.shape
