"""Synthetic multi-resolution training data.

The reference trains on a prepared sketchfab hdf5 the repo does not
ship (``Readme.md:31,57`` points at an external download), so a fresh
checkout cannot train out of the box.  This module generates a
multi-resolution dataset in exactly the file format / filename
convention ``load_h5_data`` (and the reference's ``data.py:78-87``)
expects: each resolution under a ``{tag}_{n}`` dataset, the resolutions
encoded in the filename.

Shapes are unit spheres modulated by per-shape low-frequency radial
fields — smooth closed surfaces with shape-specific structure, so the
upsampler has a surface prior to learn (pure noise has none).  All
resolutions of a shape sample the SAME underlying surface, which is the
property the multi-resolution labels rely on.  This is the family every
hardware training benchmark in ``benchmarks/`` uses (train_demo,
train_production, e2e_quality, quality_head2head).

Generate from the command line::

    python -m threepu.data.synthetic /tmp/data --shapes 20
    python -m threepu.cli --phase train --h5_data /tmp/data/train_*.hdf5 \
        --num_shape_point 5000 --num_point 312 --id demo

"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import numpy as np

DEFAULT_RESOLUTIONS: Tuple[int, ...] = (5000, 10000, 20000, 40000, 80000)


def synthetic_surface(n: int, coef: np.ndarray,
                      rng: np.random.Generator) -> np.ndarray:
    """Sample ``n`` points of the modulated-sphere surface defined by a
    ``(4, 4)`` coefficient field: ``r(x, y) = 1 + sum_ij c_ij
    sin(3.1 i x) cos(3.1 j y)`` over unit-sphere directions."""
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    mod = np.ones((n,), np.float32)
    for i in range(4):
        for j in range(4):
            mod += (coef[i, j] * np.sin(i * pts[:, 0] * 3.1)
                    * np.cos(j * pts[:, 1] * 3.1))
    return pts * mod[:, None]


def write_synthetic_h5(out_dir: str, n_shapes: int = 20, seed: int = 7,
                       resolutions: Sequence[int] = DEFAULT_RESOLUTIONS,
                       tag: str = "poisson",
                       filename: str = None) -> str:
    """Write ``train_{tag}_{n1}_..._{nK}.hdf5`` under ``out_dir`` and
    return its path.  Filename and dataset names follow the reference
    convention so both ``threepu`` and the reference ``data.py`` can
    load the file directly.  ``filename`` overrides the derived name
    (e.g. held-out sets in the same directory as a train file with the
    same resolutions — the derived name would overwrite it)."""
    import h5py

    resolutions = tuple(sorted(int(r) for r in resolutions))
    if filename is None:
        filename = "train_" + "_".join(
            f"{tag}_{r}" for r in resolutions) + ".hdf5"
    path = os.path.join(out_dir, filename)
    os.makedirs(out_dir, exist_ok=True)

    rng = np.random.default_rng(seed)
    coef = rng.standard_normal((n_shapes, 4, 4)).astype(np.float64) * 0.12
    with h5py.File(path, "w") as f:
        for res in resolutions:
            arr = np.stack([synthetic_surface(res, coef[s], rng)
                            for s in range(n_shapes)])
            f.create_dataset(f"{tag}_{res}", data=arr)
    return path


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        "threepu.data.synthetic",
        description="generate a reference-format synthetic training h5")
    ap.add_argument("out_dir", help="directory to write the hdf5 into")
    ap.add_argument("--shapes", type=int, default=20)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--resolutions", type=int, nargs="+",
                    default=list(DEFAULT_RESOLUTIONS))
    ap.add_argument("--tag", default="poisson")
    args = ap.parse_args(argv)
    path = write_synthetic_h5(args.out_dir, n_shapes=args.shapes,
                              seed=args.seed,
                              resolutions=args.resolutions, tag=args.tag)
    print(path)


if __name__ == "__main__":
    main()
