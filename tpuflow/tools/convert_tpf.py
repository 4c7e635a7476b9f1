"""Convert a trajectory archive (.h5/.hdf5/.npz) to the .tpf store.

The .tpf format (tpuflow/data/tpf.py) is the native-loader fast path:
page-aligned raw float32 arrays the C++ loader streams with fused
normalization and async prefetch. Use for multi-GB datasets where
h5py decompression + Python batch assembly stalls the train loop.

Usage: python -m tpuflow.tools.convert_tpf in.h5 out.tpf
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("src", help="input archive (.h5/.hdf5/.npz)")
    p.add_argument("dst", help="output store (.tpf)")
    a = p.parse_args(argv)
    if not a.dst.endswith(".tpf"):
        p.error("dst must end with .tpf")

    from tpuflow.data.dataset import load_archive
    from tpuflow.data.tpf import save_tpf

    lf, hf = load_archive(a.src)
    save_tpf(a.dst, lf, hf)
    print(f"ok: {a.dst} lf={lf.shape} hf={hf.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
