"""On-device batch augmentation.

Device-side (jit-compiled) equivalent of the reference's per-worker
numpy augmentation (``data.py:143-172``): optional per-point jitter,
normalization of input+label by the *label* patch's centroid/radius,
and a shared random 3-axis rotation per batch element.  Implements the
*intended* behaviour of the reference's latent bugs (undefined
``input_pc`` in the jitter path, ``data.py:148-149``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def random_rotations(key: Array, batch: int, dtype=jnp.float32) -> Array:
    """(B, 3, 3) rotation matrices Rz @ Ry @ Rx with uniform angles
    (matches ``utils/pc_utils.py:53-64``)."""
    angles = jax.random.uniform(key, (batch, 3), dtype=dtype,
                                maxval=2 * jnp.pi)
    cx, sx = jnp.cos(angles[:, 0]), jnp.sin(angles[:, 0])
    cy, sy = jnp.cos(angles[:, 1]), jnp.sin(angles[:, 1])
    cz, sz = jnp.cos(angles[:, 2]), jnp.sin(angles[:, 2])
    zero = jnp.zeros_like(cx)
    one = jnp.ones_like(cx)
    rx = jnp.stack([one, zero, zero,
                    zero, cx, -sx,
                    zero, sx, cx], -1).reshape(batch, 3, 3)
    ry = jnp.stack([cy, zero, sy,
                    zero, one, zero,
                    -sy, zero, cy], -1).reshape(batch, 3, 3)
    rz = jnp.stack([cz, -sz, zero,
                    sz, cz, zero,
                    zero, zero, one], -1).reshape(batch, 3, 3)
    return rz @ ry @ rx


def jitter_points(key: Array, pts: Array, sigma: float, clip: float,
                  is_2d: bool = False) -> Array:
    """Clipped gaussian per-point jitter (``utils/pc_utils.py:28-42``)."""
    noise = jnp.clip(sigma * jax.random.normal(key, pts.shape, pts.dtype),
                     -clip, clip)
    if is_2d:
        noise = noise.at[..., 2:].set(0.0)
    return pts + noise


def augment_batch(key: Array, input_patches: Array, label_patches: Array,
                  jitter: bool = False, jitter_sigma: float = 0.005,
                  jitter_max: float = 0.01, is_2d: bool = False,
                  rotate: bool = True) -> Tuple[Array, Array]:
    """input (B, K, 3), label (B, rK, 3) -> augmented pair.

    Pipeline (reference ``data.py:143-172``): jitter input -> normalize
    both by the label patch statistics -> shared random rotation."""
    k_jit, k_rot = jax.random.split(key)
    if jitter:
        input_patches = jitter_points(k_jit, input_patches, jitter_sigma,
                                      jitter_max, is_2d)

    from threepu.ops.normalize import normalize_point_batch_cl

    label_patches, centroid, radius = normalize_point_batch_cl(
        label_patches)
    input_patches = (input_patches - centroid) / radius

    if rotate:
        rot = random_rotations(k_rot, input_patches.shape[0],
                               input_patches.dtype)
        input_patches = input_patches @ rot
        label_patches = label_patches @ rot
    return input_patches, label_patches
