"""Run the reference implementation (/root/reference) on torch-CPU.

The reference imports two CUDA extensions and faiss at module scope
(``network/operations.py:2-9``, ``network/model_loss.py:2``), but none
of its *active* numerics need CUDA: ``group_knn`` is pure torch, and the
kernels have simple, documented semantics (SURVEY.md §2.1).  This module
installs CPU-torch stand-ins under the extension module names — with the
exact in-place calling conventions of the pybind bindings
(``sampling/sampling.cpp:26-89``, ``losses/nmdistance.cpp:24-27``) — so
the reference code runs untouched on CPU.  That turns "parity with the
reference" from an aspiration into an executable check: initialize
threepu params, export them through the ``.pth`` bridge, load them into
the reference modules, and compare forwards/gradients numerically
(``tests/test_reference_parity.py``, ``benchmarks/parity_reference.py``).

The stubs re-derive each kernel's behaviour from its semantics; nothing
is copied.  The reference tree is imported for behaviour only.
"""

from __future__ import annotations

import sys
import types
from typing import Any, Dict, Optional

import numpy as np

REFERENCE_ROOT = "/root/reference"


# ------------------------------------------------------------------ stubs
def _make_sampling_module():
    """CPU stand-in for the ``sampling`` extension
    (``sampling/sampling.cpp:83-89``)."""
    import torch

    mod = types.ModuleType("sampling")

    def furthest_sampling(b, n, m, xyz, temp, idx):
        # semantics of sampling_cuda.cu:103-174: seed index 0, per-point
        # min-distance carry initialized by the caller (1e10), iterative
        # argmax of the carry
        for bi in range(b):
            last = 0
            idx[bi, 0] = 0
            for i in range(1, m):
                d = torch.sum((xyz[bi] - xyz[bi, last]) ** 2, dim=-1)
                torch.minimum(temp[bi], d, out=temp[bi])
                last = int(torch.argmax(temp[bi]))
                idx[bi, i] = last
        return idx

    def gather_forward(b, c, n, npoints, points, idx, out):
        # out[b, c, m] = points[b, c, idx[b, m]] (sampling_cuda.cu:28-41)
        expanded = idx.long().unsqueeze(1).expand(-1, c, -1)
        out.copy_(torch.gather(points, 2, expanded))
        return out

    def gather_backward(b, c, n, npoints, grad_out, idx, grad_points):
        # grad_points[b, c, idx[b, m]] += grad_out[b, c, m]
        expanded = idx.long().unsqueeze(1).expand(-1, c, -1)
        grad_points.scatter_add_(2, expanded, grad_out)
        return grad_points

    def ball_query(query, xyz, radius, nsample):
        # sequential-scan fill semantics of sampling_cuda.cu:269-305:
        # slots pre-filled with the first hit, zero when no hit
        bq, m, _ = query.shape
        out = torch.zeros((bq, m, nsample), dtype=torch.int32)
        r2 = radius * radius
        for bi in range(bq):
            d2 = torch.sum(
                (xyz[bi][None, :, :] - query[bi][:, None, :]) ** 2, dim=-1)
            for qi in range(m):
                hits = torch.nonzero(d2[qi] < r2).flatten()
                if hits.numel() == 0:
                    continue
                take = hits[:nsample]
                out[bi, qi, :] = int(take[0])
                out[bi, qi, : take.numel()] = take.to(torch.int32)
        return out

    mod.furthest_sampling = furthest_sampling
    mod.gather_forward = gather_forward
    mod.gather_backward = gather_backward
    mod.ball_query = ball_query
    return mod


def _make_losses_module():
    """CPU stand-in for the ``losses`` extension
    (``losses/nmdistance.cpp:24-27``)."""
    import torch

    mod = types.ModuleType("losses")

    def nmdistance_forward(xyz1, xyz2, dist1, dist2, idx1, idx2):
        # bidirectional squared NN distance (nmdistance_cuda.cu:11-153).
        # Same direct-subtraction numerics as the CUDA kernel, chunked
        # over the N axis: the full (B, N, M, 3) broadcast is ~4.8 GB
        # at eval scale (80k x 5k), the (B, chunk, M, 3) transient is
        # bounded
        n = xyz1.shape[1]
        chunk = max(1, min(n, 4_000_000 // max(1, xyz2.shape[1])))
        v2 = None
        for s in range(0, n, chunk):
            blk = torch.sum(
                (xyz1[:, s:s + chunk, None, :]
                 - xyz2[:, None, :, :]) ** 2, dim=-1)
            bv1, bi1 = torch.min(blk, dim=2)
            dist1[:, s:s + chunk] = bv1
            idx1[:, s:s + chunk] = bi1.to(idx1.dtype)
            bv2, bi2 = torch.min(blk, dim=1)
            bi2 = bi2 + s
            if v2 is None:
                v2, i2 = bv2, bi2
            else:
                better = bv2 < v2  # strict: first (lowest-index) min wins
                v2 = torch.where(better, bv2, v2)
                i2 = torch.where(better, bi2, i2)
        dist2.copy_(v2)
        idx2.copy_(i2.to(idx2.dtype))
        return dist1, dist2, idx1, idx2

    def nmdistance_backward(xyz1, xyz2, gradxyz1, gradxyz2,
                            graddist1, graddist2, idx1, idx2):
        # intended gradients (nmdistance_cuda.cu:154-194): for each point
        # accumulate +-2 * g * (x1 - x2) into both clouds
        diff1 = xyz1 - torch.gather(
            xyz2, 1, idx1.long().unsqueeze(-1).expand(-1, -1, 3))
        g1 = 2.0 * graddist1.unsqueeze(-1) * diff1
        gradxyz1 += g1
        gradxyz2.scatter_add_(
            1, idx1.long().unsqueeze(-1).expand(-1, -1, 3), -g1)

        diff2 = xyz2 - torch.gather(
            xyz1, 1, idx2.long().unsqueeze(-1).expand(-1, -1, 3))
        g2 = 2.0 * graddist2.unsqueeze(-1) * diff2
        gradxyz2 += g2
        gradxyz1.scatter_add_(
            1, idx2.long().unsqueeze(-1).expand(-1, -1, 3), -g2)
        return gradxyz1, gradxyz2

    mod.nmdistance_forward = nmdistance_forward
    mod.nmdistance_backward = nmdistance_backward
    return mod


def install_reference_stubs() -> None:
    """Idempotently register ``sampling``/``losses``/``faiss`` stand-ins
    so the reference modules import cleanly on CPU."""
    if "sampling" not in sys.modules or not hasattr(
            sys.modules["sampling"], "furthest_sampling"):
        sys.modules["sampling"] = _make_sampling_module()
    if "losses" not in sys.modules or not hasattr(
            sys.modules["losses"], "nmdistance_forward"):
        sys.modules["losses"] = _make_losses_module()
    if "faiss" not in sys.modules:
        # imported unconditionally (operations.py:2) but only touched by
        # the dead GPU path; torch.cuda.is_available() is False here so
        # faiss_setup is never imported (operations.py:8-9)
        sys.modules["faiss"] = types.ModuleType("faiss")


def import_reference():
    """Import and return the reference ``network`` package modules as a
    namespace (operations, layers, upsampler, model_loss) with the
    latent ``NmDistanceFunction.backward`` NameError fixed
    (``model_loss.py:22-23`` reads ``d_dist1`` before assignment)."""
    install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        # append, never insert(0): the reference ships generic
        # top-level module names (utils, data, model, main, network)
        # that would otherwise shadow every later absolute import in
        # the process, including site-packages
        sys.path.append(REFERENCE_ROOT)
    import network.operations as operations
    import network.layers as ref_layers
    import network.upsampler as ref_upsampler
    import network.model_loss as ref_model_loss

    _fix_nmdistance_backward(ref_model_loss)
    ns = types.SimpleNamespace(
        operations=operations, layers=ref_layers,
        upsampler=ref_upsampler, model_loss=ref_model_loss)
    return ns


def _fix_nmdistance_backward(ref_model_loss) -> None:
    """Replace the broken ``NmDistanceFunction.backward``
    (``model_loss.py:20-28``: ``d_dist1`` is undefined) with the intended
    implementation so reference gradients are computable."""
    import torch

    if getattr(ref_model_loss.NmDistanceFunction, "_threepu_fixed", False):
        return

    @staticmethod
    def backward(ctx, graddist1, gradNone1, graddist2, gradNone2):
        xyz1, xyz2, idx1, idx2 = ctx.saved_tensors
        gradxyz1 = torch.zeros_like(xyz1)
        gradxyz2 = torch.zeros_like(xyz2)
        sys.modules["losses"].nmdistance_backward(
            xyz1, xyz2, gradxyz1, gradxyz2,
            graddist1.contiguous(), graddist2.contiguous(), idx1, idx2)
        return gradxyz1, gradxyz2

    ref_model_loss.NmDistanceFunction.backward = backward
    ref_model_loss.NmDistanceFunction._threepu_fixed = True
    # rebind the module-level alias so nndistance picks up the fix
    ref_model_loss.nndistance = ref_model_loss.NmDistanceFunction.apply


# ----------------------------------------------------------- param bridge
def make_reference_net(max_up_ratio: int = 16, step_ratio: int = 2,
                       knn: int = 32, growth_rate: int = 12,
                       dense_n: int = 3, fm_knn: int = 5,
                       max_num_point: int = 312):
    """Construct the reference ``Net`` (``network/upsampler.py:9-37``)
    with the CLI-default hyperparameters (``main.py:114-115``)."""
    ref = import_reference()
    return ref.upsampler.Net(
        max_up_ratio=max_up_ratio, step_ratio=step_ratio, knn=knn,
        growth_rate=growth_rate, dense_n=dense_n, fm_knn=fm_knn,
        max_num_point=max_num_point)


def load_params_into_reference(ref_net, params: Any,
                               strict: bool = True) -> None:
    """Load a threepu flax param tree into a reference torch ``Net``
    via the export bridge (``threepu/io/checkpoint.py``)."""
    import torch

    from threepu.io.checkpoint import export_reference_state

    state = export_reference_state(params)["states"]
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in state.items()}
    ref_net.load_state_dict(tensors, strict=strict)


def reference_state_dict(params: Any) -> Dict[str, "np.ndarray"]:
    from threepu.io.checkpoint import export_reference_state
    return export_reference_state(params)["states"]
