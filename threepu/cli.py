"""Command-line interface.

Mirrors the reference flag surface and phase dispatch (``main.py:19-77,
392-424``): ``--phase {train,test,vis}``, the same 27 flags with the
same defaults (including flags the reference declares but never uses —
``--model``, ``--root_dir``, ``--record_data``, ``--block_n``,
``--restore_epoch``, ``--fidelity_weight`` — kept for drop-in
compatibility), the same derived ``NUM_POINT`` rule (``main.py:87``) and
the same result-directory naming ``p{N}_s{N}_{clean|s####}[_d##]``
(``main.py:392-414``).

Run as ``python -m threepu.cli ...`` or via the ``threepu`` console
entry point.
"""

from __future__ import annotations

import argparse
import os
import time
from glob import glob
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("threepu")
    p.add_argument("--phase", default="test",
                   help="train or test or vis [default: test]")
    p.add_argument("--device", type=int, default=0,
                   help="device ordinal to use (reference: --gpu)")
    p.add_argument("--gpu", type=int, default=0,
                   help="alias of --device for drop-in compatibility")
    p.add_argument("--id", default="demo",
                   help="experiment name, prepended to log_dir")
    p.add_argument("--log_dir", default="./model", help="Log dir")
    p.add_argument("--model", default="model_microscope",
                   help="(unused, reference compatibility)")
    p.add_argument("--root_dir", default="../",
                   help="(unused, reference compatibility)")
    p.add_argument("--result_dir", help="result directory")
    p.add_argument("--ckpt", help="model to restore from (.npz or .pth)")
    p.add_argument("--num_point", type=int, help="patch point number")
    p.add_argument("--num_shape_point", type=int,
                   help="number of points per shape")
    p.add_argument("--up_ratio", type=int, default=16,
                   help="upsampling ratio [default: 16]")
    p.add_argument("--max_epoch", type=int, default=160)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--h5_data", help="h5 file for training")
    p.add_argument("--record_data",
                   help="(unused, reference compatibility)")
    p.add_argument("--test_data", help="test data glob path")
    p.add_argument("--lr_init", type=float, default=0.0005)
    p.add_argument("--restore_epoch", type=int,
                   help="(unused, reference compatibility)")
    p.add_argument("--stage_steps", type=int, default=15000,
                   help="updates per curriculum stage")
    p.add_argument("--step_ratio", type=int, default=2)
    p.add_argument("--patch_num_ratio", type=float, default=3)
    p.add_argument("--jitter", action="store_true")
    p.add_argument("--jitter_sigma", type=float, default=0.0025)
    p.add_argument("--jitter_max", type=float, default=0.005)
    p.add_argument("--drop_out", type=float, default=1.0)
    p.add_argument("--knn", type=int, default=32)
    p.add_argument("--dense_n", type=int, default=3)
    p.add_argument("--block_n", type=int, default=3,
                   help="(unused, reference compatibility)")
    p.add_argument("--fm_knn", type=int, default=5)
    p.add_argument("--growth_rate", type=int, default=12)
    p.add_argument("--cd_threshold", type=float, default=2.0)
    p.add_argument("--fidelity_weight", type=float, default=50.0,
                   help="(declared-but-unused in the reference, "
                        "main.py:74-75; same here)")
    p.add_argument("--loss_weight_mode", default="floored",
                   choices=["floored", "reference"],
                   help="per-ratio loss weight: 'reference' reproduces "
                        "model.py:72 exactly (zero at max ratio)")
    p.add_argument("--chunk", type=int, default=8,
                   help="patch chunk size for inference memory bounding")
    p.add_argument("--knn_method", default="exact",
                   choices=["auto", "exact", "approx", "sort"],
                   help="kNN selection backend (default exact, matching "
                        "the reference's torch.topk — measured zero-cost "
                        "and bit-identical to 'auto' at the headline "
                        "config, RESULTS.md round 3); 'auto' switches to "
                        "approximate top-k on TPU for large candidate "
                        "sets with small k")
    p.add_argument("--select_kernel", default="on", choices=["on", "off"],
                   help="route exact kNN selection through the Pallas "
                        "min-extraction kernel on TPU (default on: "
                        "BIT-IDENTICAL output, 16x headline 59.0k -> "
                        "75.3k pts/s, +50s compile — "
                        "benchmarks/select_pallas_bench.py); 'off' "
                        "restores plain lax.top_k")
    p.add_argument("--bucket", type=int,
                   help="point-count bucket quantum for mixed-size test "
                        "sets: shapes are padded+masked to the next "
                        "multiple so each bucket compiles once "
                        "(same selection semantics; outputs set-"
                        "identical to exact-size compiles; try 1024)")
    p.add_argument("--profile_dir",
                   help="profile the first shape: a jax.profiler trace "
                        "where the backend supports it; under the axon "
                        "TPU tunnel (which drops profiler data) a "
                        "manual wall-clock summary is written instead "
                        "(profile.json)")
    p.add_argument("--restitch_groups", type=int, default=None,
                   help="final re-stitch FPS grouping.  Default auto: "
                        "G=8 Morton-stratified hierarchical FPS on "
                        "large outputs (>= 16384 points; held-out "
                        "Chamfer equal to exact at trained weights, "
                        "+8%% throughput, ~5x faster compile — "
                        "benchmarks/restitch_quality.py), exact below. "
                        "1: the reference's exact final FPS "
                        "(main.py:379-380) everywhere.  G>1: force "
                        "hierarchical with G spatial groups")
    return p


def result_path_for(flags) -> str:
    """Result dir naming (``main.py:392-414``)."""
    num_point = flags.num_point or (
        int(flags.num_shape_point * flags.drop_out)
        if flags.num_shape_point else None)
    parts = []
    parts.append(f"p{num_point}" if num_point is not None else "pWhole")
    parts.append(f"s{flags.num_shape_point}"
                 if flags.num_shape_point is not None else "sWhole")
    if flags.jitter:
        parts.append("s{}".format(
            f"{flags.jitter_sigma:.4f}".replace(".", "")))
    else:
        parts.append("clean")
    if flags.drop_out < 1:
        parts.append("d{}".format(f"{flags.drop_out:.2f}".replace(".", "")))
    model_dir = os.path.join(flags.log_dir, flags.id)
    return flags.result_dir or os.path.join(
        model_dir, "result", f"x{flags.up_ratio}", "_".join(parts))


def _build_net(flags):
    from threepu.models import Net
    return Net(max_up_ratio=flags.up_ratio, step_ratio=flags.step_ratio,
               knn=flags.knn, growth_rate=flags.growth_rate,
               dense_n=flags.dense_n, fm_knn=flags.fm_knn)


def _load_params(flags, net):
    import jax
    import jax.numpy as jnp
    from threepu.io import load_checkpoint, import_pth
    from threepu.utils import logger

    num_point = flags.num_point or int(
        flags.num_shape_point * flags.drop_out)
    rng = np.random.default_rng(0)
    ex = jnp.asarray(rng.standard_normal(
        (1, min(num_point, 312), 3)).astype(np.float32))
    gt = jnp.asarray(rng.standard_normal(
        (1, ex.shape[1] * flags.up_ratio, 3)).astype(np.float32))
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      ex, flags.up_ratio, gt, train=True)["params"]
    if flags.ckpt:
        loader = import_pth if flags.ckpt.endswith(".pth") \
            else load_checkpoint
        restored, step = loader(flags.ckpt, {"params": params})
        params = restored["params"]
        logger.info(f"restored {flags.ckpt} (step {step})")
    return params


def run_test(flags, result_dir: str) -> None:
    """Upsample every file matching --test_data (``main.py:333-389``)."""
    from threepu.inference import upsample_shape
    from threepu.io import load, save_ply
    from threepu.utils import logger

    net = _build_net(flags)
    params = _load_params(flags, net)
    num_point = flags.num_point or int(
        flags.num_shape_point * flags.drop_out)
    if flags.num_point is None and num_point > 1024:
        # the reference derives NUM_POINT = num_shape_point * drop_out
        # when --num_point is omitted (main.py:87), i.e. ONE patch the
        # size of the whole shape — almost always a forgotten flag, and
        # at 5000+ points it compiles a multi-gigabyte cascade program
        # (an explicit --num_point of any size is respected silently)
        logger.warn(
            f"patch size num_point={num_point} (whole shape?) — the "
            f"canonical eval uses --num_point 312; this will be "
            f"extremely slow and memory-hungry")

    files = sorted(glob(flags.test_data, recursive=True))
    if not files:
        logger.warn(f"no files match {flags.test_data}")
        return
    # overlap host IO with device compute: file i+1 parses (and the
    # previous PLYs write) on worker threads while the device upsamples
    # file i — the TPU never waits on the filesystem
    from concurrent.futures import ThreadPoolExecutor
    io_pool = ThreadPoolExecutor(max_workers=2)
    pending_writes = []
    next_data = io_pool.submit(load, files[0], flags.num_shape_point)
    for i, path in enumerate(files):
        folder = os.path.basename(os.path.dirname(path))
        out_path = os.path.join(result_dir, folder,
                                os.path.basename(path)[:-4] + ".ply")
        data = next_data.result()
        if i + 1 < len(files):
            next_data = io_pool.submit(load, files[i + 1],
                                       flags.num_shape_point)
        logger.info(os.path.basename(path))
        import contextlib
        prof_ctx = contextlib.nullcontext()
        manual_profile = False
        if flags.profile_dir and i == 0:
            import jax
            from threepu.utils.profiling import trace_supported
            if trace_supported():
                prof_ctx = jax.profiler.trace(flags.profile_dir)
            else:
                # the axon tunnel silently drops profiler traces
                # (CLAUDE.md) — record a manual compile-vs-steady wall
                # summary instead and point at the stage attributor
                os.makedirs(flags.profile_dir, exist_ok=True)
                manual_profile = True
        start = time.time()
        with prof_ctx:
            inp, up = upsample_shape(
                net, params, data, flags.up_ratio, num_point=num_point,
                patch_num_ratio=flags.patch_num_ratio, chunk=flags.chunk,
                jitter=flags.jitter, jitter_sigma=flags.jitter_sigma,
                jitter_max=flags.jitter_max, drop_out=flags.drop_out,
                bucket=flags.bucket,
                restitch_groups=flags.restitch_groups)
        if manual_profile:
            import json
            import jax
            with open(os.path.join(flags.profile_dir,
                                   "profile.json"), "w") as f:
                json.dump({
                    "note": "jax.profiler.trace unsupported under "
                            "the axon tunnel; wall summary only — "
                            "run benchmarks/profile_stages.py for "
                            "per-stage attribution",
                    "first_shape_s_incl_compile":
                        round(time.time() - start, 3),
                    "backend": jax.default_backend(),
                }, f, indent=1)
        logger.info(f"total time: {time.time() - start:.3f}s "
                    f"({up.shape[0]} points)")
        for w in [w for w in pending_writes if w.done()]:
            w.result()  # surface write errors
        pending_writes = [w for w in pending_writes if not w.done()]
        pending_writes.append(
            io_pool.submit(save_ply, inp, out_path[:-4] + "_input.ply"))
        pending_writes.append(io_pool.submit(save_ply, up, out_path))
        logger.success(out_path)
    for w in pending_writes:
        w.result()
    io_pool.shutdown()


def run_train(flags) -> None:
    from threepu.train import train_loop, TrainConfig
    from threepu.vis import VisdomMonitor

    cfg = TrainConfig(
        h5_data=flags.h5_data, num_shape_point=flags.num_shape_point,
        num_point=flags.num_point, batch_size=flags.batch_size,
        up_ratio=flags.up_ratio, step_ratio=flags.step_ratio,
        knn=flags.knn, growth_rate=flags.growth_rate,
        dense_n=flags.dense_n, fm_knn=flags.fm_knn,
        lr_init=flags.lr_init, max_epoch=flags.max_epoch,
        stage_steps=flags.stage_steps, cd_threshold=flags.cd_threshold,
        jitter=flags.jitter, jitter_sigma=flags.jitter_sigma,
        jitter_max=flags.jitter_max, drop_out=flags.drop_out,
        ckpt=flags.ckpt, model_dir=os.path.join(flags.log_dir, flags.id),
        weight_mode=flags.loss_weight_mode)
    monitor = VisdomMonitor(env=flags.id)
    train_loop(cfg, log_fn=monitor.log_train_step)


def run_vis(flags, result_dir: str) -> None:
    from threepu.vis import vis_phase
    net = _build_net(flags)
    params = _load_params(flags, net)
    vis_phase(flags, net, params, result_dir)


def main(argv: Optional[list] = None) -> None:
    # Honor JAX_PLATFORMS explicitly: environments whose site hooks
    # register an accelerator plugin at interpreter start (the axon TPU
    # tunnel does) can override the env var's backend selection, so a
    # caller launching ``JAX_PLATFORMS=cpu threepu ...`` would silently
    # initialize — and, if the tunnel is unreachable, hang on — the
    # accelerator.  ``jax.config`` wins over the plugin hook as long as
    # it is set before the first backend initialization, i.e. here.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        import jax
        jax.config.update("jax_platforms", env_platforms)
    flags = build_parser().parse_args(argv)
    from threepu.ops.knn import set_knn_method, set_exact_select_pallas
    set_knn_method(flags.knn_method)
    set_exact_select_pallas(flags.select_kernel == "on")
    result_dir = result_path_for(flags)
    if flags.phase == "test":
        assert flags.ckpt is not None, "--ckpt required for test"
        run_test(flags, result_dir)
    elif flags.phase == "vis":
        assert flags.ckpt is not None, "--ckpt required for vis"
        run_vis(flags, result_dir)
    elif flags.phase == "train":
        run_train(flags)
    else:
        raise SystemExit(f"unknown phase {flags.phase!r}")


if __name__ == "__main__":
    main()
