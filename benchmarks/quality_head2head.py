"""Quality head-to-head: threepu vs the ACTUAL reference, trained on
identical data.

Both implementations start from the SAME initial weights (via the .pth
bridge), see the SAME patch batches (sampled once with threepu's device
dataset, replayed into torch), run the SAME optimization recipe
(Adam 5e-4, grad value-clip 1.0, reference loss weighting — the exact
``model.py:21-23,53-66`` recipe), then 4x-upsample the SAME held-out
sparse shape through their own whole-shape pipelines (threepu:
``upsample_shape``; reference: the ``pc_prediction`` flow of
``main.py:214-246`` driven by the reference's own ops) and score
Chamfer against its dense ground truth.  This turns the e2e_quality
self-relative claim into a comparative one: does the TPU-native
framework learn/infer AT LEAST as well as the torch original on shared
data?

CPU-only (the reference runs through the torch-CPU bridge).

Usage: python benchmarks/quality_head2head.py [--steps 300]
           [--ratio 16 --curriculum]
Results recorded in benchmarks/RESULTS.md.

``--ratio 16 --curriculum`` is the flagship configuration
(``Readme.md:31``): both sides train through a compressed 4-stage
curriculum (``stage_steps = steps // 8`` so every stage, the combined
sampling window and the Chamfer-threshold window are crossed — the
``main.py:118-124,171-182`` schedule) and the held-out shape is
upsampled 16x through each implementation's full re-patch/merge
cascade.  The per-step (ratio, threshold) schedule is precomputed
host-side from one seeded RNG so both sides see literally the same
batches under the same loss configuration; internal sub-patch seeding
(the train-mode re-patch at levels >1) stays each implementation's own
randomness, as it does in real training.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# --platform tpu runs the threepu side on the chip (torch reference is
# CPU either way; the comparison is quality-level, robust to device
# rounding).  Must be decided BEFORE any jax import — the axon site
# hook overrides env-based selection (CLAUDE.md).
_PLATFORM = ("tpu" if "--platform" in sys.argv
             and sys.argv[sys.argv.index("--platform") + 1] == "tpu"
             else "cpu")

import jax

if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the env var alone is NOT honored when a site hook registers an
    # accelerator plugin at interpreter start (the axon tunnel does);
    # jax.config wins as long as no backend is initialized yet
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from train_demo import synth_dataset

# default ratio 4 = levels 1-2; deep enough to need the interlevel
# skip, shallow enough that the torch-CPU side stays tractable.
# --ratio 16 runs the flagship full cascade.
HYPER = dict(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
             dense_n=3, fm_knn=5, max_num_point=312)


def chamfer_np(a: np.ndarray, b: np.ndarray) -> float:
    import jax.numpy as jnp
    from threepu.losses import chamfer_loss

    return float(chamfer_loss(jnp.asarray(a)[None], jnp.asarray(b)[None]))


def reference_upsample(ref, ref_net, shape: np.ndarray, num_point: int,
                       ratio: int,
                       patch_num_ratio: float = 3.0) -> np.ndarray:
    """The reference ``test()``/``pc_prediction`` flow (``main.py:
    214-246,333-389``) on torch-CPU: normalize, FPS patch seeds, kNN
    patches, per-patch normalized forward, concat, final FPS."""
    import torch

    from threepu.utils import pc_utils

    data, centroid, furthest = pc_utils.normalize_point_cloud(shape)
    pc = torch.from_numpy(data.T[None]).contiguous()        # 1x3xN
    n = pc.shape[2]
    num_patches = int(n / num_point * patch_num_ratio)
    _, seeds = ref.operations.furthest_point_sample(pc, num_patches)
    patches, _, _ = ref.operations.group_knn(num_point, seeds, pc,
                                             unique=False, NCHW=True)
    preds = []
    ref_net.eval()
    with torch.no_grad():
        for i in range(num_patches):
            patch = patches[:, :, i, :]
            norm, cent, rad = ref.operations.normalize_point_batch(
                patch, NCHW=True)
            up = ref_net(norm, ratio=ratio)
            preds.append(up * rad + cent)
    merged = torch.cat(preds, dim=2)
    _, out = ref.operations.furthest_point_sample(merged, n * ratio)
    out = out[0].numpy().T
    return out * furthest + centroid


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ratio", type=int, default=4,
                    help="held-out upsample ratio (16 = flagship)")
    ap.add_argument("--curriculum", action="store_true",
                    help="train through the compressed 4-stage "
                         "curriculum (stage_steps = steps // 8) "
                         "instead of a fixed ratio")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test the harness with a tiny net "
                         "(fast CPU compiles; NOT a quality result)")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu",
                    help="device for the threepu side (parsed before "
                         "jax initializes; reference torch is CPU "
                         "either way)")
    args = ap.parse_args()
    if args.tiny:
        # growth_rate/dense_n must stay at the defaults: the reference
        # hardcodes its channel schedule (upsampler.py:212-224 literal
        # 84/144/204/264) and only builds at growth 12, dense_n 3
        HYPER.update(knn=8, fm_knn=3, max_num_point=64)

    # jax is imported (and the platform pinned) at module level
    print("threepu platform:", jax.default_backend(), flush=True)

    import h5py
    import jax.numpy as jnp
    import torch

    from threepu.data import DeviceDataset
    from threepu.io import save_pth
    from threepu.models import Net
    from threepu.ops import knn as knn_mod
    from threepu.testing import import_reference, make_reference_net
    from threepu.train.model import (TrainState, make_optimizer,
                                     train_step, loss_weight)
    from threepu.inference import upsample_shape

    knn_mod.set_knn_method("exact")  # parity conditions
    ref = import_reference()

    tmp = tempfile.mkdtemp()
    train_h5 = synth_dataset(os.path.join(
        tmp, "train_poisson_5000_poisson_10000_poisson_20000_"
        "poisson_40000_poisson_80000.hdf5"), n_shapes=10, seed=7)
    held_h5 = synth_dataset(os.path.join(
        tmp, "held_poisson_5000_poisson_10000_poisson_20000_"
        "poisson_40000_poisson_80000.hdf5"), n_shapes=1, seed=1234)
    with h5py.File(held_h5, "r") as f:
        held_in = f["poisson_5000"][0].astype(np.float32)
        # gt at args.ratio x the 5000-pt input
        held_gt = f[f"poisson_{5000 * args.ratio}"][0].astype(np.float32)

    # ---- per-step (ratio, threshold) schedule, shared by both sides
    if args.curriculum:
        from threepu.data.curriculum import curriculum_state

        stage_steps = max(args.steps // 8, 1)
        crng = np.random.default_rng(42)
        schedule = []
        for s in range(args.steps):
            cur = curriculum_state(s, stage_steps, args.ratio, 2)
            schedule.append((cur.choose_ratio(crng), cur.threshold))
    else:
        schedule = [(args.ratio, None)] * args.steps

    # ---- identical batches for both sides (threepu device sampler)
    dataset = DeviceDataset(train_h5, 5000, 312, batch_size=args.batch,
                            up_ratio=16, step_ratio=2)
    key = jax.random.PRNGKey(0)
    batches = []
    for s in range(args.steps):
        inp, gt = dataset.sample(jax.random.fold_in(key, s), s,
                                 schedule[s][0])
        batches.append((np.asarray(inp), np.asarray(gt)))

    # ---- identical initial weights via the .pth bridge
    net = Net(**HYPER)
    ex_in = jnp.asarray(batches[0][0])
    ex_gt = jnp.asarray(batches[0][1])
    params = net.init({"params": jax.random.PRNGKey(1),
                       "patch": jax.random.PRNGKey(2)},
                      ex_in, schedule[0][0], ex_gt, train=True)["params"]
    pth = save_pth(tmp, params, step=0, label="h2h", epoch=0)
    ref_net = make_reference_net(**HYPER)
    ref_net.load_state_dict(
        torch.load(pth, weights_only=False)["states"], strict=True)

    # ---- threepu training
    tx = make_optimizer(5e-4)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.asarray(0, jnp.int32))
    t0 = time.time()
    last_j = []
    for s, (x, gt) in enumerate(batches):
        ratio_s, thresh_s = schedule[s]
        state, cd = train_step(net, tx, state, jax.random.fold_in(key, s),
                               jnp.asarray(x), jnp.asarray(gt), ratio_s,
                               threshold=thresh_s,
                               weight_mode="reference")
        last_j.append(float(cd) * loss_weight(ratio_s, 16, 2, "reference"))
    t_j = time.time() - t0
    print(f"threepu: {args.steps} steps in {t_j:.1f}s "
          f"(last-20 loss {np.mean(last_j[-20:]):.5f})", flush=True)

    # ---- reference training (model.py:53-66 recipe)
    def to_t(x):
        return torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 2, 1)))

    opt = torch.optim.Adam(ref_net.parameters(), lr=5e-4,
                           betas=(0.9, 0.999))
    crit = ref.model_loss.ChamferLoss()
    ref_net.train()
    t0 = time.time()
    last_t = []
    for s, (x, gt) in enumerate(batches):
        ratio_s, thresh_s = schedule[s]
        if thresh_s is not None:
            crit.set_threshold(thresh_s)
        else:
            crit.unset_threshold()
        opt.zero_grad()
        out_t, gt_t = ref_net(to_t(x), ratio=ratio_s, gt=to_t(gt))
        loss = crit(out_t.transpose(1, 2).contiguous(),
                    gt_t.transpose(1, 2).contiguous()
                    ) * loss_weight(ratio_s, 16, 2, "reference")
        loss.backward()
        torch.nn.utils.clip_grad_value_(ref_net.parameters(), 1)
        opt.step()
        last_t.append(float(loss.detach()))
    t_t = time.time() - t0
    print(f"reference: {args.steps} steps in {t_t:.1f}s "
          f"(last-20 loss {np.mean(last_t[-20:]):.5f})", flush=True)

    # ---- held-out upsample through each implementation's pipeline
    t0 = time.time()
    # restitch_groups=1: the reference side uses the exact final FPS;
    # the head-to-head keeps both pipelines reference-exact
    _, up_j = upsample_shape(net, state.params, held_in, args.ratio,
                             num_point=312, chunk=8, restitch_groups=1)
    cd_j = chamfer_np(up_j, held_gt)
    t_ev_j = time.time() - t0
    t0 = time.time()
    up_t = reference_upsample(ref, ref_net, held_in, 312, args.ratio)
    cd_t = chamfer_np(up_t, held_gt)
    t_ev_t = time.time() - t0
    cd_input = chamfer_np(held_in, held_gt)

    report = {
        "steps": args.steps, "batch": args.batch, "ratio": args.ratio,
        "curriculum": bool(args.curriculum),
        "eval_wall_s_threepu_cpu": round(t_ev_j, 1),
        "eval_wall_s_reference_cpu": round(t_ev_t, 1),
        "train_loss_last20_threepu": round(float(np.mean(last_j[-20:])), 6),
        "train_loss_last20_reference": round(float(np.mean(last_t[-20:])), 6),
        "chamfer_heldout_threepu": cd_j,
        "chamfer_heldout_reference": cd_t,
        "chamfer_heldout_sparse_input": cd_input,
        "train_wall_s_threepu_cpu": round(t_j, 1),
        "train_wall_s_reference_cpu": round(t_t, 1),
    }
    print(json.dumps(report), flush=True)
    ok = cd_j <= cd_t * 1.1  # at least reference-level quality
    print("HEAD2HEAD:", "OK" if ok else "FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
