"""Network building blocks.

TPU-native re-design of ``network/layers.py``: the reference's 1x1
``Conv1d/Conv2d`` stacks become plain dense contractions over a
channels-last ``(B, N, C)`` layout, which XLA maps straight onto the MXU
(``N x C @ C x C'``).  ``DenseEdgeConv`` keeps the reference's exact
dense-connectivity schedule (``network/layers.py:44-64``):

    i == 0      : y = concat(relu(mlp0(edge)), tile(x))
    0 < i < n-1 : y = concat(relu(mlp_i(y)), y)
    i == n-1    : y = concat(mlp_last(y), y)      # no activation
    out         = max over the k neighbour axis

so output channels = in_channels + growth*n (24 -> 60 with growth 12,
n 3), giving the Level channel schedule 24/84/144/204/264 after the
per-block concats.

Weight-compatible with the reference: each ``mlps_i`` dense kernel is the
transposed, squeezed 1x1 conv weight (see ``threepu.io.checkpoint``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from threepu.ops import knn_group, fps_indices, gather_nd
from threepu.ops.gather import batched_gather, batched_gather_t

Array = jax.Array

#: Layout of the fused dense-edge-conv per-neighbour chain.
#: "lanes" (default): state is (B, N, k, G) with the G=12 channel axis
#: minor — every gather/chain matmul pads 12 lanes to the MXU's 128.
#: "transposed": state is (B, G, N*k) with the big N*k axis on lanes —
#: the one-hot gather issues as (G, M) @ (M, N*k) and the 12x12 chain
#: matmuls as (12, 12) @ (12, N*k).  A sublane-quantized FLOP model
#: predicts ~8-12x less issued MXU work, but ON CHIP it measures ~11%
#: SLOWER at the production op — 78.0 vs 70.0 ms chained x20
#: (benchmarks/ec_layout_bench.py, RESULTS.md round 3): a matmul
#: streaming only m=12..16 rows cannot amortize the 128x128 MXU
#: weight loads, so small-m matmuls effectively quantize m up to the
#: full tile — both layouts issue the same hardware work and the
#: transposed one adds transpose/broadcast traffic.  Same math up to
#: float reassociation; parameters are shared (TestFusedEdgeConv).
#: Override per-process with THREEPU_FUSED_LAYOUT (benchmark A/B knob).
FUSED_LAYOUT = os.environ.get("THREEPU_FUSED_LAYOUT", "lanes")


def _xavier_uniform():
    return nn.initializers.xavier_uniform()


class DenseConv(nn.Module):
    """1x1 convolution equivalent: a dense layer over the channel axis
    with optional activation (reference ``layers.Conv1d/Conv2d``,
    ``network/layers.py:115-204``; normalization variants are accepted
    for API parity but the reference never enables them).

    ``dtype`` is the compute dtype (params stay float32): pass
    ``jnp.bfloat16`` for MXU-native feature compute."""

    features: int
    activation: Optional[str] = None
    use_bias: bool = True
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.features, use_bias=self.use_bias,
                     kernel_init=_xavier_uniform(),
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype,
                     name="conv")(x)
        if self.activation is None:
            return x
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "elu":
            return nn.elu(x)
        if self.activation == "lrelu":
            return nn.leaky_relu(x, negative_slope=0.1)
        raise ValueError(f"unsupported activation {self.activation!r}")


class _RawDenseParams(nn.Module):
    """Parameter holder with the exact tree layout of ``nn.Dense``
    (kernel (in, out), bias (out,)) for decomposed-compute paths."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _xavier_uniform(),
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class DenseEdgeConv(nn.Module):
    """Densely-connected edge convolution (``network/layers.py:6-64``).

    Builds a kNN graph in *feature* space (k+1 neighbours, self dropped),
    forms edge features ``[x_center, x_nn - x_center]`` and runs the
    dense-concat MLP schedule, max-pooling over neighbours.
    """

    growth_rate: int
    n: int
    k: int
    dtype: Optional[object] = None

    def get_local_graph(self, x: Array, idx: Optional[Array] = None,
                        dup_mask: Optional[Array] = None):
        """x: (B, N, C) -> edge features (B, N, k, 2C), idx (B, N, k).

        ``dup_mask`` marks duplicate *input points*: feature rows can
        only collide when the underlying points do (features are a
        deterministic per-point function of xyz), so the Level computes
        the mask once on 3-channel xyz instead of each block paying an
        N^2*C feature comparison."""
        if idx is None:
            res = knn_group(x, x, self.k + 1, unique=True,
                            dup_mask=dup_mask)
            idx = res.idx[..., 1:]
            nbrs = res.neighbors[..., 1:, :]
        else:
            nbrs = batched_gather(x, idx)
        center = jnp.broadcast_to(x[..., :, None, :], nbrs.shape)
        edge = jnp.concatenate([center, nbrs - center], axis=-1)
        return edge, idx

    fused: bool = True

    @nn.compact
    def __call__(self, x: Array, idx: Optional[Array] = None,
                 dup_mask: Optional[Array] = None,
                 pallas: bool = False) -> Tuple[Array, Array]:
        """``pallas=True`` routes the activation chain through the fused
        VMEM-resident kernel (:mod:`threepu.ops.edgeconv_pallas`) —
        forward-only, so callers enable it on eval paths only."""
        if self.fused:
            return self._fused(x, idx, dup_mask, pallas)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i in range(self.n):
            mlp = nn.Dense(self.growth_rate, kernel_init=_xavier_uniform(),
                           bias_init=nn.initializers.zeros,
                           dtype=self.dtype,
                           name=f"mlps_{i}")
            if i == 0:
                y, idx = self.get_local_graph(x, idx=idx,
                                              dup_mask=dup_mask)
                tiled = jnp.broadcast_to(
                    x[..., :, None, :], x.shape[:-1] + (self.k, x.shape[-1]))
                y = jnp.concatenate([nn.relu(mlp(y)), tiled], axis=-1)
            elif i == self.n - 1:
                y = jnp.concatenate([mlp(y), y], axis=-1)
            else:
                y = jnp.concatenate([nn.relu(mlp(y)), y], axis=-1)
        y = jnp.max(y, axis=-2)
        return y, idx

    def _fused(self, x: Array, idx: Optional[Array],
               dup_mask: Optional[Array],
               pallas: bool = False) -> Tuple[Array, Array]:
        """TPU-fused evaluation of the same function.

        Key identity: every per-neighbour matmul input is the concat
        ``[g_{i-1}, ..., g_0, x_tiled]`` where ``x_tiled`` is constant
        over the k axis, and ``mlp0(edge)`` with
        ``edge = [center, nbr - center]`` splits as
        ``gather(x @ Wd) + x @ (Wc - Wd)``.  So the only per-neighbour
        tensors are ``growth_rate``-channel (12-wide) activations — the
        ``(B, N, k, 2C)`` edge features and the fat per-k matmuls of the
        naive schedule never materialize.  Numerics are identical up to
        float reassociation; parameters are shared with the naive path.
        """
        g = self.growth_rate
        c = x.shape[-1]
        if idx is None:
            # feature-space graph construction: 3-pass (HIGH) matmul is
            # accurate to ~1e-6 relative and 2x cheaper than HIGHEST
            res = knn_group(x, x, self.k + 1, unique=True,
                            dup_mask=dup_mask, with_neighbors=False,
                            precision=jax.lax.Precision.HIGH)
            idx = res.idx[..., 1:]

        # parameters: identical tree paths/shapes to the naive schedule
        # (mlps_i/{kernel, bias}, matching nn.Dense and the reference's
        # torch Conv2d stack); the decomposed compute consumes them raw.
        ins = [2 * c] + [g * i + c for i in range(1, self.n)]
        w, b = [], []
        for i in range(self.n):
            wi, bi = _RawDenseParams(g, ins[i], name=f"mlps_{i}")()
            w.append(wi)
            b.append(bi)

        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = [wi.astype(self.dtype) for wi in w]
            b = [bi.astype(self.dtype) for bi in b]

        if pallas:
            # VMEM-resident chain kernel: XLA computes only the tiny
            # per-point terms; the (B, N, k, G) chain never touches HBM
            from threepu.ops.edgeconv_pallas import edge_conv_chain_pallas
            xf = x.astype(jnp.float32)
            wf = [wi.astype(jnp.float32) for wi in w]
            bf = [bi.astype(jnp.float32) for bi in b]
            wc, wd = wf[0][:c], wf[0][c:]
            z = xf @ wd
            pts = [xf @ (wc - wd) + bf[0]]
            chain_w = []
            for i in range(1, self.n):
                pts.append(xf @ wf[i][g * i:] + bf[i])
                for j in range(i):
                    chain_w.append(wf[i][g * j: g * (j + 1)])
            pooled = edge_conv_chain_pallas(z, idx, pts, chain_w,
                                            self.n, g)
            pooled = pooled.astype(x.dtype)
            return jnp.concatenate([pooled, x], axis=-1), idx

        if FUSED_LAYOUT == "transposed":
            return self._fused_t(x, idx, w, b)

        wc, wd = w[0][:c], w[0][c:]
        z = x @ wd                                       # (B, N, G)
        zn = batched_gather(z, idx)                      # (B, N, k, G)
        point_term = x @ (wc - wd) + b[0]                # (B, N, G)
        gs = [nn.relu(zn + point_term[..., None, :])]    # g_0

        for i in range(1, self.n):
            # kernel rows: [g_{i-1}, ..., g_0, x]
            acc = x @ w[i][g * i:] + b[i]                # per-point part
            per_k = None
            for j in range(i):
                wj = w[i][g * j: g * (j + 1)]            # rows of g_{i-1-j}
                term = gs[i - 1 - j] @ wj
                per_k = term if per_k is None else per_k + term
            y = per_k + acc[..., None, :]
            gs.append(y if i == self.n - 1 else nn.relu(y))

        pooled = [jnp.max(gi, axis=-2) for gi in reversed(gs)]
        return jnp.concatenate(pooled + [x], axis=-1), idx

    def _fused_t(self, x: Array, idx: Array, w, b) -> Tuple[Array, Array]:
        """Transposed-layout evaluation of the fused schedule.

        Identical math to the "lanes" schedule (up to float
        reassociation); the per-neighbour state lives as ``(B, G, N*k)``
        with the big axis on MXU lanes, so neither the one-hot gather
        nor the 12x12 chain matmuls pay the G -> 128 lane quantization
        (see ``FUSED_LAYOUT``).
        """
        g = self.growth_rate
        c = x.shape[-1]
        k = idx.shape[-1]
        n_pts = x.shape[-2]

        def rep_t(t: Array) -> Array:
            # (..., N, G) -> (..., G, N*k): column n repeated k times,
            # matching the gather's flat index order r = n*k + j
            tt = jnp.swapaxes(t, -1, -2)
            tt = jnp.broadcast_to(tt[..., None], tt.shape + (k,))
            return tt.reshape(tt.shape[:-2] + (n_pts * k,))

        wc, wd = w[0][:c], w[0][c:]
        z = x @ wd                                       # (B, N, G)
        zn_t = batched_gather_t(z, idx)                  # (B, G, N*k)
        point_term = x @ (wc - wd) + b[0]                # (B, N, G)
        gs = [nn.relu(zn_t + rep_t(point_term))]         # g_0

        for i in range(1, self.n):
            # kernel rows: [g_{i-1}, ..., g_0, x]
            acc = rep_t(x @ w[i][g * i:] + b[i])         # per-point part
            per_k = None
            for j in range(i):
                wj = w[i][g * j: g * (j + 1)]            # rows of g_{i-1-j}
                term = jnp.einsum("gh,...gr->...hr", wj, gs[i - 1 - j])
                per_k = term if per_k is None else per_k + term
            y = per_k + acc
            gs.append(y if i == self.n - 1 else nn.relu(y))

        pooled = []
        for gi in reversed(gs):
            gi = gi.reshape(gi.shape[:-1] + (n_pts, k))  # (..., G, N, k)
            pooled.append(jnp.swapaxes(jnp.max(gi, axis=-1), -1, -2))
        return jnp.concatenate(pooled + [x], axis=-1), idx


class SampledDenseEdgeConv(nn.Module):
    """Edge conv from FPS-sampled query points against the full set
    (``network/layers.py:67-112``); used by :class:`AdaptiveLevel`.

    ``nsample == 1`` collapses to the point nearest the centroid.
    """

    growth_rate: int
    n: int
    k: int

    @nn.compact
    def __call__(self, x: Array, nsample: int, xyz: Array):
        """x: (B, N, C) features; xyz: (B, N, 3).  Returns
        (y (B, nsample, C'), sampled_xyz (B, nsample, 3), sampled_idx)."""
        if nsample == 1:
            centroid = jnp.mean(xyz, axis=-2, keepdims=True)
            res = knn_group(centroid, xyz, 1, unique=False)
            sampled_xyz = res.neighbors[..., 0, :]
            sampled_idx = res.idx[..., 0]
        else:
            sampled_idx = fps_indices(xyz, nsample)
            sampled_xyz = gather_nd(xyz, sampled_idx)
        sampled_x = gather_nd(x, sampled_idx)

        for i in range(self.n):
            mlp = nn.Dense(self.growth_rate, kernel_init=_xavier_uniform(),
                           bias_init=nn.initializers.zeros,
                           name=f"mlps_{i}")
            if i == 0:
                res = knn_group(sampled_x, x, self.k + 1, unique=True)
                nbrs = res.neighbors[..., 1:, :]
                center = jnp.broadcast_to(
                    sampled_x[..., :, None, :], nbrs.shape)
                y = jnp.concatenate([center, nbrs - center], axis=-1)
                tiled = jnp.broadcast_to(center, nbrs.shape)
                y = jnp.concatenate([nn.relu(mlp(y)), tiled], axis=-1)
            elif i == self.n - 1:
                y = jnp.concatenate([mlp(y), y], axis=-1)
            else:
                y = jnp.concatenate([nn.relu(mlp(y)), y], axis=-1)
        y = jnp.max(y, axis=-2)
        return y, sampled_xyz, sampled_idx
