"""End-to-end quality loop: train on synthetic surfaces, upsample a
HELD-OUT shape, score Chamfer against its dense ground truth.

Without the reference's pretrained checkpoint (not shipped in the repo,
``Readme.md:31``), this is the strongest available whole-framework
correctness argument: the production training loop must actually LEARN
a surface prior, and the production inference pipeline must apply it —
the trained Chamfer has to beat both the random-init net and the sparse
input baseline on a shape the net never saw.

Usage: python benchmarks/e2e_quality.py [--steps 1200] [--stage_steps 150]
Results recorded in benchmarks/RESULTS.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from train_demo import synth_dataset


def chamfer(a: np.ndarray, b: np.ndarray) -> float:
    import jax.numpy as jnp
    from threepu.losses import chamfer_loss

    return float(chamfer_loss(jnp.asarray(a)[None], jnp.asarray(b)[None]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--stage_steps", type=int, default=150)
    ap.add_argument("--knn_ablation", action="store_true",
                    help="after training, upsample the held-out shape "
                         "with exact vs approx kNN selection and record "
                         "the quality (Chamfer) and throughput of both "
                         "(the asterisk on the headline: ops/knn.py "
                         "'auto' uses approx_max_k on TPU at N >= 4096 "
                         "where the reference is always exact)")
    args = ap.parse_args()

    import jax
    import h5py
    print("backend:", jax.default_backend(), flush=True)

    from threepu.train.loop import TrainConfig, train_loop, build_net
    from threepu.inference import upsample_shape

    tmp = tempfile.mkdtemp()
    train_h5 = synth_dataset(os.path.join(
        tmp, "train_poisson_5000_poisson_10000_poisson_20000_"
        "poisson_40000_poisson_80000.hdf5"), n_shapes=20, seed=7)
    held_h5 = synth_dataset(os.path.join(
        tmp, "held_poisson_5000_poisson_10000_poisson_20000_"
        "poisson_40000_poisson_80000.hdf5"), n_shapes=2, seed=1234)

    with h5py.File(held_h5, "r") as f:
        inp = f["poisson_5000"][0].astype(np.float32)
        gt = f["poisson_80000"][0].astype(np.float32)

    cfg = TrainConfig(
        h5_data=train_h5, num_shape_point=5000, num_point=312,
        stage_steps=args.stage_steps, model_dir=os.path.join(tmp, "m"))
    os.makedirs(cfg.model_dir, exist_ok=True)

    net = build_net(cfg)

    def upsample_with(params):
        _, up = upsample_shape(net, params, inp, 16, num_point=312,
                               chunk=8)
        return np.asarray(up)

    # random-init baseline (same net, untrained)
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    ex = jnp.asarray(rng.standard_normal((1, 312, 3)), jnp.float32)
    egt = jnp.asarray(rng.standard_normal((1, 4992, 3)), jnp.float32)
    params0 = net.init({"params": jax.random.PRNGKey(0),
                        "patch": jax.random.PRNGKey(1)}, ex, 16, egt,
                       train=True)["params"]
    cd_init = chamfer(upsample_with(params0), gt)
    cd_input = chamfer(inp, gt)
    print(f"baselines: input-vs-gt {cd_input:.3e}  "
          f"random-init {cd_init:.3e}", flush=True)

    t0 = time.time()
    state, error_log = train_loop(cfg, max_steps=args.steps)
    wall = time.time() - t0
    cd_trained = chamfer(upsample_with(state.params), gt)

    knn_rows = {}
    if args.knn_ablation:
        from threepu.ops import knn as knn_mod
        from threepu.inference import upsample_point_cloud, upsample_shape

        for method in ("auto", "exact"):
            knn_mod.set_knn_method(method)
            # the selection backend is read at TRACE time — bust the
            # pipeline's jit cache so the method actually applies
            upsample_point_cloud.clear_cache()
            t0 = time.time()
            cd = chamfer(upsample_with(state.params), gt)
            compile_s = time.time() - t0
            times = []
            for i in range(2):
                fresh = np.random.default_rng(100 + i).standard_normal(
                    (5000, 3)).astype(np.float32)
                t0 = time.time()
                _, up = upsample_shape(net, state.params, fresh, 16,
                                       num_point=312, chunk=8)
                float(up.std())
                times.append(time.time() - t0)
            knn_rows[method] = {
                "chamfer_trained": cd,
                "wall_s_per_shape": round(min(times), 3),
                "pts_per_s": round(80000 / min(times), 1),
                "compile_s": round(compile_s, 1),
            }
            print(f"knn={method}: {knn_rows[method]}", flush=True)
        knn_mod.set_knn_method("auto")

    report = {
        "train_steps": args.steps, "train_wall_s": round(wall, 1),
        "knn_ablation": knn_rows,
        "chamfer_input_vs_gt": cd_input,
        "chamfer_random_init": cd_init,
        "chamfer_trained": cd_trained,
        "beats_random_init": bool(cd_trained < cd_init),
        "beats_sparse_input": bool(cd_trained < cd_input),
        "error_log": {str(k): round(v, 6)
                      for k, v in sorted(error_log.items())},
    }
    print(json.dumps(report), flush=True)
    ok = report["beats_random_init"] and report["beats_sparse_input"]
    print("E2E QUALITY:", "OK" if ok else "FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
