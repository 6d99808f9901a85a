"""End-to-end numeric regression guard.

A fixed-seed tiny net upsamples a fixed shape; the Chamfer distance
between output and input must stay within a band recorded when the
pipeline was validated (round 1).  Catches silent numeric drift from
refactors — any intentional semantic change must update the band.
"""

import numpy as np
import jax
import jax.numpy as jnp

from threepu.models import Net
from threepu.inference import upsample_point_cloud
from oracles import nn_distance_oracle


def test_golden_pipeline_chamfer():
    rng = np.random.default_rng(1234)
    net = Net(max_up_ratio=4, step_ratio=2, knn=8, growth_rate=4,
              dense_n=2, max_num_point=32, fm_knn=3)
    pts = rng.standard_normal((96, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)

    ex = jnp.asarray(pts[None, :32])
    gt = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32))
    params = net.init({"params": jax.random.PRNGKey(7),
                       "patch": jax.random.PRNGKey(8)},
                      ex, 4, gt, train=True)["params"]

    out = np.asarray(upsample_point_cloud(
        net, params, jnp.asarray(pts), 4, num_point=32, num_out=384,
        chunk=4))
    assert out.shape == (384, 3)
    d1, _, d2, _ = nn_distance_oracle(out, pts)
    cd = d1.mean() + d2.mean()
    # recorded 2026-08-16 (round 1): cd = 0.042870 on cpu x64/highest.
    # Band is generous: structural regressions blow it up by orders of
    # magnitude, float-level noise does not.
    assert 0.005 < cd < 0.4, f"golden chamfer drifted: {cd}"
