"""threepu — a TPU-native (JAX/XLA/Pallas) framework for patch-based
progressive 3D point set upsampling.

Re-implements the full capability surface of the reference CUDA/PyTorch
implementation of "Patch-based Progressive 3D Point Set Upsampling"
(Yifan et al., CVPR 2019; reference repo ``yifita/3PU_pytorch``) with a
brand-new architecture designed for TPU hardware:

- geometric ops (kNN, furthest point sampling, gather, ball query) as
  MXU-friendly XLA programs and Pallas kernels (``threepu.ops``),
- the bidirectional nearest-neighbour (Chamfer) distance as a tiled
  Pallas kernel with a custom VJP (``threepu.ops.chamfer``),
- the DenseEdgeConv / Level / progressive-cascade network as flax
  modules over a channels-last ``(B, N, C)`` layout (``threepu.models``),
- a fully on-device training pipeline: patch sampling, augmentation and
  the optimizer step compile into a single XLA program
  (``threepu.data``, ``threepu.train``),
- patch parallelism over ``jax.sharding.Mesh`` for multi-chip scaling
  (``threepu.parallel``),
- point-cloud IO, checkpointing (native + ``.pth`` import) and the CLI
  mirroring the reference flag surface (``threepu.io``, ``threepu.cli``).

The package name is the importable spelling of ``3pu_pytorch_tpu``
(Python identifiers cannot begin with a digit).
"""

__version__ = "0.1.0"

from threepu import ops  # noqa: F401
