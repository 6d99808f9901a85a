"""Index gathering with scatter-add gradients.

Capability twin of the reference CUDA ``gather_points`` forward/backward
(``sampling/sampling_cuda.cu:28-100``, autograd wrapper
``network/operations.py:219-266``).  On TPU a native XLA gather is
optimal and already differentiable — its transpose is a deterministic
scatter-add, replacing the CUDA ``atomicAdd``.  Kept as a named op (with
an explicit ``custom_vjp`` mirroring the reference API contract: no
gradient flows to ``idx``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gather_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """``out[b, c, i] = features[b, c, idx[b, i]]``.

    Args:
      features: ``(B, C, N)``.
      idx: ``(B, M)`` integer indices.

    Returns:
      ``(B, C, M)``.
    """
    return jnp.take_along_axis(features, idx[:, None, :], axis=2)


def _gather_fwd(features, idx):
    return gather_points(features, idx), (idx, features.shape)


def _gather_bwd(res, g):
    idx, shape = res
    grad = jnp.zeros(shape, g.dtype)
    grad = grad.at[
        jnp.arange(shape[0])[:, None, None],
        jnp.arange(shape[1])[None, :, None],
        idx[:, None, :],
    ].add(g)
    return grad, None


gather_points.defvjp(_gather_fwd, _gather_bwd)


def gather_nd(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Channels-last gather: ``points (B, N, C)``, ``idx (B, M)`` ->
    ``(B, M, C)``.  Differentiable natively."""
    return jnp.take_along_axis(points, idx[..., None], axis=-2)


#: one-hot dispatch bounds: the (batch, X, M) one-hot operand must stay
#: small enough to be a cheap HBM transient, and M small enough that
#: building it is trivial.  Patch-scale gathers (M <= ~2k) qualify;
#: merged-cloud gathers (M >= 15k) stay on the native gather path.
_ONEHOT_MAX_M = 2048
_ONEHOT_MAX_BYTES = 192 * 1024 * 1024


def _onehot_qualifies(points, idx) -> bool:
    return (points.dtype in (jnp.dtype(jnp.float32),
                             jnp.dtype(jnp.bfloat16))
            and points.shape[-2] <= _ONEHOT_MAX_M)


def _split_bf16_planes(x: jax.Array):
    """Exact 3-plane bf16 decomposition of an f32 array: the planes sum
    to ``x`` bit-exactly (8+8+8 mantissa bits cover f32's 24)."""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def batched_gather_t(points: jax.Array, idx: jax.Array,
                     method: str = "auto") -> jax.Array:
    """Transposed-output row gather: ``points (..., M, C)``,
    ``idx (..., X1, ..., Xk)`` -> ``(..., C, X1*...*Xk)``.

    Same selection as :func:`batched_gather`, but the one-hot matmul is
    issued as ``(C, M) @ (M, X)`` so the large flattened index axis
    lands on the MXU *lane* dimension instead of the C-wide output.
    For the edge-conv chain gathers (C = growth = 12, X = N*k ~ 1e4)
    the lane-quantized issued FLOPs drop ~8x vs the ``(X, M) @ (M, C)``
    orientation whose 12 output lanes pad to 128
    (``benchmarks/roofline.py``).

    Exact for f32: ``points`` is split into three bf16 planes (8+8+8
    mantissa bits = f32's 24) and each plane rides one default-precision
    MXU pass against the exactly-representable 0/1 one-hot — 3 passes
    vs the 6 of a HIGHEST-precision f32 matmul.  bf16 inputs take a
    single pass.
    """
    batch_shape = points.shape[:-2]
    extra_elems = 1
    for d in idx.shape[len(batch_shape):]:
        extra_elems *= d
    flat = idx.reshape(batch_shape + (extra_elems,))
    if method == "auto":
        method = ("onehot" if jax.default_backend() == "tpu"
                  and _onehot_qualifies(points, idx) else "take")
    if method != "onehot":
        out = jnp.take_along_axis(points, flat[..., None], axis=-2)
        return jnp.swapaxes(out, -1, -2)
    m = points.shape[-2]
    p_t = jnp.swapaxes(points, -1, -2)                    # (..., C, M)
    if points.dtype == jnp.dtype(jnp.bfloat16):
        planes = (p_t,)
    else:
        planes = _split_bf16_planes(p_t)
    import numpy as _np
    batch = int(_np.prod(batch_shape, dtype=_np.int64)) or 1
    # segment the lane axis: the (batch, M, seg) bf16 one-hot operand
    # stays a bounded HBM transient at any batch size
    seg = max(1, _ONEHOT_MAX_BYTES // max(1, batch * m * 2))
    n_seg = -(-extra_elems // seg)
    pieces = []
    for s in range(n_seg):
        part = flat[..., s * seg:(s + 1) * seg]
        oh = (jnp.arange(m)[:, None] == part[..., None, :]
              ).astype(jnp.bfloat16)                      # (..., M, seg)
        acc = None
        for h in planes:
            term = jnp.matmul(h.astype(jnp.bfloat16), oh,
                              preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
        pieces.append(acc.astype(points.dtype))
    return pieces[0] if n_seg == 1 else jnp.concatenate(pieces, axis=-1)


def batched_gather(points: jax.Array, idx: jax.Array,
                   method: str = "auto") -> jax.Array:
    """Row gather with arbitrary trailing index shape and NO broadcast
    blow-up: ``points (..., M, C)``, ``idx (..., X1, ..., Xk)`` ints in
    [0, M) -> ``(..., X1, ..., Xk, C)``.

    The naive ``take_along_axis(points[..., None, :, :], idx[..., None],
    axis=-2)`` pattern materializes a ``(..., X, M, C)`` broadcast under
    XLA (a 60GB allocation at cascade level 4); flattening the index
    axes first keeps it a true gather.

    ``method``:
      - ``"take"``: native XLA gather (transpose = scatter-add).
      - ``"onehot"``: gather as a one-hot HIGHEST-precision matmul —
        ``out = onehot(idx) @ points`` rides the MXU and its transpose
        is a *matmul*, not a scatter.  Bit-exact (each output row is a
        single product with 1.0).  On TPU the native row gather lowers
        to per-row dynamic slices (~2.5 GB/s measured); the one-hot form
        measured 2.1x faster on the full b16 x16 train step.
      - ``"auto"``: one-hot on TPU at patch scale (see bounds above),
        native gather otherwise.
    """
    if method == "auto":
        method = ("onehot" if jax.default_backend() == "tpu"
                  and _onehot_qualifies(points, idx) else "take")
    batch_shape = points.shape[:-2]
    extra = idx.shape[len(batch_shape):]
    flat = idx.reshape(batch_shape + (-1,))
    if method == "onehot":
        m = points.shape[-2]
        x = flat.shape[-1]
        import numpy as _np
        batch = int(_np.prod(batch_shape, dtype=_np.int64)) or 1
        # segment the index axis so the one-hot operand stays a bounded
        # HBM transient at any batch size (the MXU path previously fell
        # back to the slow native gather past the bound — a 2.4x
        # train-throughput cliff at batch 32)
        seg = max(1, _ONEHOT_MAX_BYTES // max(1, batch * m * 4))
        n_seg = -(-x // seg)
        pieces = []
        for s in range(n_seg):
            part = flat[..., s * seg:(s + 1) * seg]
            oh = (part[..., None] == jnp.arange(m)).astype(points.dtype)
            pieces.append(jnp.matmul(
                oh, points, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=points.dtype))
        out = pieces[0] if n_seg == 1 else jnp.concatenate(pieces,
                                                          axis=-2)
    else:
        out = jnp.take_along_axis(points, flat[..., None], axis=-2)
    return out.reshape(batch_shape + extra + (points.shape[-1],))
