"""Import every code asset from the reference checkout into assets/*.npz so
the framework is fully standalone (the registry prefers assets/ over the
read-only reference text files; see utils/registry.py search order).

Usage: python tools/import_assets.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from cuda_ldpc_tpu.utils import registry


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    outdir = pathlib.Path(args.out) if args.out else registry.ASSETS_DIR

    for name in registry.BINARY_CODES:
        base, Z = registry.load_binary_base(name)
        p = registry.save_binary_npz(name, base, Z, outdir)
        print(f"binary {name}: J={base.shape[0]} L={base.shape[1]} Z={Z} -> {p}")

    for name in registry.NB_CODES:
        f = registry.load_nb_code_file(name)
        p = registry.save_nb_npz(name, f, outdir)
        print(f"nb {name}: N={f.n_sym} M={f.m_sym} GF({f.q}) -> {p}")

    # the NB fixture codeword (myNBLDPC/include/codeword_test.h)
    cw = registry.load_test_codeword(96)
    np.savez_compressed(outdir / "codeword_test_96.npz", symbols=cw)
    print(f"fixture codeword: {cw.size} symbols -> {outdir}/codeword_test_96.npz")
    return 0


if __name__ == "__main__":
    sys.exit(main())
