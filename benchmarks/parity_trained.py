"""Reference parity AT TRAINED WEIGHTS (round-3 verdict: every parity
test ran at random init, but the reference's ground truth is behavior
under *converged* weights — ``Readme.md:37``, ``final_poisson.pth`` —
where activation statistics, outlier masks, and duplicate structure are
nothing like random init).

Takes a production-trained threepu checkpoint (the 120k-step curriculum
run of ``train_production.py``), exports it through the two-way ``.pth``
bridge (``threepu/io/checkpoint.py::save_pth``) into the UNTOUCHED
reference torch net (``load_state_dict(strict=True)``), and asserts:

1. patch-level 16x eval agreement on REAL surface patches (the full
   dynamic re-patch/merge/FPS cascade, ``upsampler.py:126-159``) —
   set-level Chamfer bound, like ``test_eval_forward_16x``;
2. whole-shape 16x agreement: the complete ``test()`` pipeline
   (``main.py:214-246,333-389``) vs ``upsample_shape`` on a held-out
   5000-pt shape, both 80k outputs scored against each other and
   against the dense ground truth;
3. a short optimizer trajectory FROM the trained weights (Adam 5e-4 +
   value-clip 1.0, identical batches, matmul precision pinned HIGHEST
   so the comparison is fp32-vs-fp32 algorithm parity, not a
   measurement of the TPU's bf16 MXU passes) — losses track within
   what a 1e-6 weight perturbation of threepu itself produces (the
   chaotic-divergence control).

The reference side always runs through the torch-CPU bridge;
``--platform tpu`` puts the threepu side on the chip.

Usage:
    python benchmarks/parity_trained.py --ckpt runs/prod_clean/model/model_final.npz \
        --held runs/prod_clean/held.hdf5 [--steps 10]
Results recorded in benchmarks/RESULTS.md (round 4).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# --platform tpu runs the threepu side on the chip (the torch reference
# is CPU either way; every assertion is set-level / loss-level, robust
# to cross-device rounding).  CPU is the default for bit-comparable
# conditions, but the full-size 16x whole-shape eval costs ~an hour of
# CPU vs ~seconds on the chip.  Platform must be pinned BEFORE any jax
# import (CLAUDE.md: the axon site hook overrides env-based selection).
_PLATFORM = ("tpu" if "--platform" in sys.argv
             and sys.argv[sys.argv.index("--platform") + 1] == "tpu"
             else "cpu")

import jax

if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np

HYPER = dict(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
             dense_n=3, fm_knn=5, max_num_point=312)


def chamfer_np(a: np.ndarray, b: np.ndarray) -> float:
    import jax.numpy as jnp
    from threepu.losses import chamfer_loss

    return float(chamfer_loss(jnp.asarray(a)[None], jnp.asarray(b)[None]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="trained threepu checkpoint (.npz)")
    ap.add_argument("--held", required=True,
                    help="held-out multi-resolution hdf5 (synth_dataset "
                         "format; shape 0 is evaluated)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--patches", type=int, default=3,
                    help="number of real surface patches for the "
                         "patch-level 16x check")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu",
                    help="device for the threepu side (parsed before "
                         "jax initializes; reference torch is CPU "
                         "either way)")
    ap.add_argument("--skip_eval", action="store_true",
                    help="skip sections 1-2 (patch/shape eval) and run "
                         "only the optimizer-trajectory section; the "
                         "pass criterion then covers the trajectory "
                         "alone")
    ap.add_argument("--traj_seed", type=int, default=7,
                    help="PRNG seed for the trajectory batches — "
                         "independent seeds make the rounding-seeded-"
                         "chaos conclusion control-paired across "
                         "draws (VERDICT r4 #8)")
    args = ap.parse_args()
    print("threepu platform:", jax.default_backend(), flush=True)

    import h5py
    import jax.numpy as jnp
    import torch

    from threepu.data import DeviceDataset
    from threepu.inference import upsample_shape
    from threepu.io import load_checkpoint, save_pth
    from threepu.models import Net
    from threepu.ops import knn as knn_mod
    from threepu.ops import group_knn, furthest_point_sample
    from threepu.testing import import_reference, make_reference_net
    from threepu.train.model import (TrainState, make_optimizer,
                                     train_step, loss_weight)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from quality_head2head import reference_upsample

    knn_mod.set_knn_method("exact")  # parity conditions
    ref = import_reference()

    # ---- trained params -> the untouched reference net, strict
    net = Net(**HYPER)
    loaded, step = load_checkpoint(args.ckpt)
    params = loaded["params"]
    print(f"loaded {args.ckpt} (step {step})", flush=True)
    tmp = tempfile.mkdtemp()
    pth = save_pth(tmp, params, step=step, label="trained", epoch=0)
    ref_net = make_reference_net(**HYPER)
    missing = ref_net.load_state_dict(
        torch.load(pth, weights_only=False)["states"], strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys

    with h5py.File(args.held, "r") as f:
        held_in = f["poisson_5000"][0].astype(np.float32)
        held_gt = f["poisson_80000"][0].astype(np.float32)

    report = {"ckpt": args.ckpt, "step": int(step)}

    # ---- 1. patch-level 16x cascade on real surface patches ----------
    # patches cut exactly as the test pipeline cuts them (FPS seed +
    # kNN group + per-patch normalize) so activation statistics are the
    # production ones, then pushed through BOTH 16x cascades.
    from threepu.ops import normalize_point_batch

    ref_net.eval()
    flips, cds = [], []
    cd_between = 0.0
    cd_j = cd_t = 1.0
    spacing2 = 1.0
    shape_j = jnp.asarray(held_in)[None]                     # (1, N, 3)
    seeds = furthest_point_sample(shape_j, args.patches, NCHW=False)[1]
    patches = group_knn(312, seeds, shape_j, NCHW=False)[0]  # (1,P,312,3)
    patches = patches.reshape(args.patches, 312, 3)
    patches, _, _ = normalize_point_batch(patches, NCHW=False)

    for i in range(0 if args.skip_eval else args.patches):
        pj = patches[i][None]
        out_j = np.asarray(net.apply({"params": params}, pj, 16,
                                     train=False))
        with torch.no_grad():
            out_t = ref_net(torch.from_numpy(
                np.asarray(pj).transpose(0, 2, 1)).contiguous(), ratio=16)
        out_t = out_t.numpy().transpose(0, 2, 1)
        assert out_t.shape == out_j.shape == (1, 312 * 16, 3)
        close = np.isclose(out_j, out_t, rtol=1e-3, atol=2e-4)
        flips.append(1.0 - close.mean())
        cds.append(chamfer_np(out_j[0], out_t[0]))
    report["patch16x_row_flip_frac"] = [round(f, 4) for f in flips]
    report["patch16x_chamfer_between"] = [float(f"{c:.3e}") for c in cds]
    nn_scale = float(np.median(np.asarray(cds))) if cds else 0.0
    print(f"patch-level 16x: flip fracs {flips}, "
          f"chamfer(threepu, reference) {cds}", flush=True)

    # ---- 2. whole-shape 16x through both full pipelines --------------
    if not args.skip_eval:
        t0 = time.time()
        # restitch_groups=1: parity vs the reference's exact final FPS
        # (main.py:379-380) must compare like with like, independent of
        # the pipeline's hierarchical-restitch default
        _, up_j = upsample_shape(net, params, held_in, 16,
                                 num_point=312, chunk=8,
                                 restitch_groups=1)
        t_j = time.time() - t0
        t0 = time.time()
        up_t = reference_upsample(ref, ref_net, held_in, 312, 16)
        t_t = time.time() - t0
        cd_between = chamfer_np(up_j, up_t)
        cd_j = chamfer_np(up_j, held_gt)
        cd_t = chamfer_np(up_t, held_gt)
        # output NN spacing^2 (nearest OTHER point): the natural scale
        # for "the same point set"
        from threepu.ops.chamfer import self_nn_dist2
        spacing2 = float(jnp.median(
            self_nn_dist2(jnp.asarray(up_j)[None])))
        report.update({
            "shape16x_chamfer_between": cd_between,
            "shape16x_chamfer_threepu_vs_gt": cd_j,
            "shape16x_chamfer_reference_vs_gt": cd_t,
            "output_nn_spacing2": spacing2,
            "eval_wall_s_threepu": round(t_j, 1),
            "eval_wall_s_reference": round(t_t, 1),
        })
        print(f"whole-shape 16x: chamfer(threepu, ref) {cd_between:.3e} "
              f"(spacing^2 {spacing2:.3e}); vs gt {cd_j:.3e} / {cd_t:.3e}",
              flush=True)

    # ---- 3. optimizer steps from the trained weights ------------------
    # cycle x2/x4/x8 (every level depth; x16 is excluded because the
    # reference weights it log2(16/16) = 0 — a gradient-free step on
    # both sides would make the trajectory vacuous; its forward is
    # already covered by sections 1-2).  The train-mode re-patch seed
    # is pinned to point 0 on both sides (as in
    # tests/test_reference_parity.py::_pin_seed_zero) so the two
    # trajectories see the same sub-patches.
    ratios = [2, 4, 8]
    # the held h5 ("held.hdf5") does not follow the reference's
    # train_{tag}_{n1}_... filename convention DeviceDataset parses;
    # sample the optimizer-step batches from the convention-named
    # train file next to it instead (in-distribution for the ckpt)
    import glob as _glob
    train_h5 = sorted(_glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(args.held)), "train_*.hdf5")))
    dataset = DeviceDataset(train_h5[0] if train_h5 else args.held,
                            5000, 312, batch_size=2,
                            up_ratio=16, step_ratio=2)
    key = jax.random.PRNGKey(args.traj_seed)
    batches = []
    for s in range(args.steps):
        r = ratios[s % len(ratios)]
        inp, gt = dataset.sample(jax.random.fold_in(key, s), s, r)
        batches.append((r, np.asarray(inp), np.asarray(gt)))

    real_t_randint = torch.randint

    def torch_zero(*a, **kw):
        size = kw.get("size")
        if size is None:
            return real_t_randint(*a, **kw)
        return torch.zeros(size, dtype=kw.get("dtype", torch.int64))

    torch.randint = torch_zero  # pin AFTER batch sampling (the device
    jax.random.randint = (      # sampler draws it own randints)
        lambda key, shape, minval, maxval, dtype=jnp.int32:
        jnp.zeros(shape, dtype))

    tx = make_optimizer(5e-4)

    def run_threepu(p0):
        # Matched-precision trajectory: this section measures ALGORITHM
        # parity, so the threepu side must not carry the TPU production
        # default of bf16-input MXU passes (a performance setting the
        # fp32 torch reference has no analogue of — it alone puts the
        # step-1 loss ~0.4% apart, swamping the 1e-6 control).  HIGHEST
        # = fp32-equivalent matmuls on both sides; the jit cache keys on
        # the context, so the production train_step program is untouched.
        with jax.default_matmul_precision("highest"):
            state = TrainState(params=p0, opt_state=tx.init(p0),
                               step=jnp.asarray(0, jnp.int32))
            losses = []
            for s, (r, x, gt) in enumerate(batches):
                state, cd = train_step(net, tx, state,
                                       jax.random.fold_in(key, s),
                                       jnp.asarray(x), jnp.asarray(gt),
                                       r, weight_mode="reference")
                losses.append(float(cd))
            return losses

    loss_j = run_threepu(params)
    # CONTROL (the round-3 divergence methodology): the same threepu
    # trajectory from params perturbed by 1e-6 RELATIVE — the scale of
    # torch-vs-XLA accumulation-order rounding in the distance
    # matrices.  At trained weights the re-patch kNN/FPS runs through
    # near-ties; a single flipped membership changes the sub-patch and
    # its gt pairing, so the LOSS VALUE legitimately jumps a few
    # percent while both trajectories remain correct.  The criterion
    # below therefore accepts threepu-vs-reference divergence up to
    # what the control itself shows (plus the strict 5% floor).
    loss_c = run_threepu(jax.tree_util.tree_map(
        lambda a: a * (1.0 + 1e-6), params))

    opt = torch.optim.Adam(ref_net.parameters(), lr=5e-4,
                           betas=(0.9, 0.999))
    crit = ref.model_loss.ChamferLoss()
    ref_net.train()

    def to_t(x):
        return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 2, 1)))

    loss_t = []
    for r, x, gt in batches:
        opt.zero_grad()
        out_t, gt_t = ref_net(to_t(x), ratio=r, gt=to_t(gt))
        cd = crit(out_t.transpose(1, 2).contiguous(),
                  gt_t.transpose(1, 2).contiguous())
        (cd * loss_weight(r, 16, 2, "reference")).backward()
        torch.nn.utils.clip_grad_value_(ref_net.parameters(), 1)
        opt.step()
        loss_t.append(float(cd.detach()))

    rel = [abs(a - b) / max(abs(b), 1e-12) for a, b in zip(loss_j, loss_t)]
    rel_c = [abs(a - b) / max(abs(b), 1e-12)
             for a, b in zip(loss_c, loss_j)]
    report["trainstep_losses_threepu"] = [float(f"{v:.5e}") for v in loss_j]
    report["trainstep_losses_reference"] = [float(f"{v:.5e}")
                                            for v in loss_t]
    report["trainstep_losses_control"] = [float(f"{v:.5e}")
                                          for v in loss_c]
    report["trainstep_loss_rel_diff_max"] = max(rel)
    report["trainstep_control_rel_diff_max"] = max(rel_c)
    print(f"{args.steps} optimizer steps at trained weights: "
          f"max relative loss diff {max(rel):.3e} "
          f"(1e-6-perturbation control: {max(rel_c):.3e})", flush=True)

    print(json.dumps(report), flush=True)
    # the two 80k outputs must be the same surface at output resolution:
    # Chamfer between them below the output's own NN spacing^2, and
    # both implementations equally close to the dense ground truth
    ok = (cd_between < spacing2
          and abs(cd_j - cd_t) / cd_t < 0.05
          and max(rel) < max(0.05, 3.0 * max(rel_c))
          and all(c < 5 * spacing2 for c in cds))
    print("PARITY_TRAINED:", "OK" if ok else "FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
