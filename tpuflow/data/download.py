"""Dataset download helpers (Zenodo-hosted archives).

Parity: SURVEY.md §1 L1 lists "dataset download helpers" alongside the
reference's data pipeline — the reference's LF/HF trajectory archives
(and pretrained checkpoints) are published on Zenodo (SURVEY.md §2
"Checkpointing" / §3.5). The exact record IDs were unverifiable in
this offline environment (empty reference mount, no network —
SURVEY.md provenance warning), so the registry below ships empty and
every entry is supplied by the user (``--url``/``--sha256`` or a
``sources.json``); the machinery — streaming download (idempotent
re-runs keep checksum-verified files; a failed transfer restarts from
scratch, no partial-file resume), SHA-256 verification, and
archive-contract validation — is complete.

Usage:
    python -m tpuflow.data.download backward-step --split train \
        --url https://zenodo.org/record/<id>/files/<name>.h5 \
        --sha256 <hex> --data-dir ./datasets

or register sources once in ``{data_dir}/sources.json``::

    {"backward-step": {"train": {"url": "...", "sha256": "..."}}}
"""

from __future__ import annotations

import argparse
import hashlib
import http.client
import json
import pathlib
import shutil
import sys
import tempfile
import urllib.error
import urllib.request

_CHUNK = 1 << 20

#: case -> split -> {"url": ..., "sha256": ...}. Intentionally empty:
#: upstream Zenodo record IDs could not be verified offline; fill via
#: sources.json or CLI flags (module docstring).
DATASET_SOURCES: dict[str, dict[str, dict[str, str]]] = {}


def sha256_file(path: pathlib.Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(_CHUNK):
            h.update(chunk)
    return h.hexdigest()


def download_file(
    url: str,
    dest: str | pathlib.Path,
    sha256: str | None = None,
    overwrite: bool = False,
) -> pathlib.Path:
    """Stream ``url`` to ``dest`` and verify its SHA-256.

    Existing files are kept if their checksum matches (idempotent
    re-runs); a checksum mismatch on a fresh download raises and
    removes the partial file.
    """
    dest = pathlib.Path(dest)
    if dest.exists() and not overwrite:
        if sha256 is None or sha256_file(dest) == sha256.lower():
            return dest
        raise ValueError(
            f"{dest} exists but its sha256 does not match; pass "
            "overwrite=True to re-download"
        )
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = tempfile.NamedTemporaryFile(
        dir=dest.parent, prefix=dest.name + ".", suffix=".part", delete=False
    )
    tmp_path = pathlib.Path(tmp.name)
    try:
        try:
            # timeout: a stalled connection must error, not hang forever.
            # http.client.HTTPException covers mid-body failures
            # (IncompleteRead is NOT an OSError) so the offline guidance
            # below fires for every transport failure mode.
            with urllib.request.urlopen(url, timeout=60) as resp:
                shutil.copyfileobj(resp, tmp.file, _CHUNK)
        except (urllib.error.URLError, OSError, http.client.HTTPException) as e:
            raise ConnectionError(
                f"download failed for {url}: {e}. This environment may be "
                "offline — use data.synthetic=true for the procedural "
                "fixture, or place archives manually (docs/DATA_FORMAT.md)."
            ) from e
        tmp.close()
        if sha256 is not None:
            got = sha256_file(tmp_path)
            if got != sha256.lower():
                raise ValueError(
                    f"sha256 mismatch for {url}: expected {sha256}, got {got}"
                )
        tmp_path.replace(dest)
    finally:
        tmp_path.unlink(missing_ok=True)
    return dest


def _load_sources(data_dir: pathlib.Path) -> dict:
    """Merge DATASET_SOURCES with ``{data_dir}/sources.json`` (file wins)."""
    merged = {c: dict(s) for c, s in DATASET_SOURCES.items()}
    p = data_dir / "sources.json"
    if p.exists():
        for case, splits in json.loads(p.read_text()).items():
            merged.setdefault(case, {}).update(splits)
    return merged


def fetch_case(
    case: str,
    data_dir: str | pathlib.Path = "./datasets",
    split: str = "train",
    url: str | None = None,
    sha256: str | None = None,
) -> pathlib.Path:
    """Fetch one (case, split) archive into the loader's expected path
    ``{data_dir}/{case}_{split}{ext}`` and validate its contract."""
    data_dir = pathlib.Path(data_dir)
    if url is None:
        src = _load_sources(data_dir).get(case, {}).get(split)
        if not src or not src.get("url"):
            raise LookupError(
                f"no registered source for ({case!r}, {split!r}); pass "
                "--url (and --sha256), or add it to "
                f"{data_dir / 'sources.json'} — the upstream Zenodo record "
                "IDs were not verifiable offline (see module docstring)."
            )
        url, sha256 = src["url"], src.get("sha256", sha256)
    # Strip query AND fragment (the '#sha256=...' convention) before
    # deriving the extension.
    ext = pathlib.Path(url.split("?", 1)[0].split("#", 1)[0]).suffix or ".h5"
    if ext not in (".h5", ".hdf5", ".npz"):
        raise ValueError(f"unsupported archive extension {ext!r} in {url}")
    dest = data_dir / f"{case}_{split}{ext}"
    download_file(url, dest, sha256=sha256)
    _validate_archive(dest)
    return dest


def _archive_shapes(path: pathlib.Path) -> tuple[tuple, tuple]:
    """(lf_shape, hf_shape) WITHOUT loading array data — h5py exposes
    dataset shapes from metadata, and .npy headers inside an .npz zip
    carry the shape; materializing a multi-GB archive just to read
    .shape would double fetch wall time and risk OOM."""
    suffix = path.suffix.lower()
    if suffix in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "r") as f:
            return tuple(f["lf"].shape), tuple(f["hf"].shape)
    if suffix == ".npz":
        import zipfile

        import numpy.lib.format as npy_format

        shapes = {}
        with zipfile.ZipFile(path) as z:
            for name in ("lf", "hf"):
                with z.open(name + ".npy") as f:
                    version = npy_format.read_magic(f)
                    if version == (1, 0):
                        shape, _, _ = npy_format.read_array_header_1_0(f)
                    else:
                        shape, _, _ = npy_format.read_array_header_2_0(f)
                    shapes[name] = tuple(shape)
        return shapes["lf"], shapes["hf"]
    from tpuflow.data.dataset import load_archive  # unknown ext: full load

    lf, hf = load_archive(path)
    return lf.shape, hf.shape


def _validate_archive(path: pathlib.Path) -> None:
    """Check the downloaded file against the docs/DATA_FORMAT.md
    contract: datasets ``lf``/``hf``, 5-D, aligned (N, T)."""
    lf_shape, hf_shape = _archive_shapes(path)
    if len(lf_shape) != 5 or len(hf_shape) != 5 or lf_shape[:2] != hf_shape[:2]:
        raise ValueError(
            f"{path} violates the archive contract: lf {lf_shape}, "
            f"hf {hf_shape} (want aligned 5-D (N, T, h, w, C))"
        )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("case", help="backward-step | cylinder-array | ...")
    p.add_argument("--split", default="train", help="train | test")
    p.add_argument("--url", default=None)
    p.add_argument("--sha256", default=None)
    p.add_argument("--data-dir", default="./datasets")
    a = p.parse_args(argv)
    dest = fetch_case(
        a.case, a.data_dir, split=a.split, url=a.url, sha256=a.sha256
    )
    print(f"ok: {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
