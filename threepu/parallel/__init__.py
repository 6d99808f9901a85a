"""Multi-chip scaling (SURVEY.md §2.3).

The reference is single-process single-GPU; its real scaling axis is
*patches* (train batches are 16 patches, inference batches patches per
shape).  Here that axis is sharded over a ``jax.sharding.Mesh``:

- :func:`make_sharded_train_step` — data-parallel training: params
  replicated, the patch batch sharded over the ``data`` axis; XLA
  inserts the gradient all-reduce over ICI.
- :func:`make_sharded_upsampler` — inference patch parallelism: the
  top-level patch axis sharded, merge/re-stitch FPS on the full shape.

No NCCL/MPI equivalent is needed: collectives are implied by sharding
annotations (the reference's NCCL mention, ``Readme.md:6,41``, is an
unused install prerequisite).
"""

from threepu.parallel.mesh import make_mesh, replicated, batch_sharded
from threepu.parallel.train import make_sharded_train_step
from threepu.parallel.inference import make_sharded_upsampler

__all__ = ["make_mesh", "replicated", "batch_sharded",
           "make_sharded_train_step", "make_sharded_upsampler"]
