"""Visualization subsystem (reference component P15).

Three pieces, all optional-dependency-gated:

- :class:`VisdomMonitor` — live training dashboard: input/output/gt
  scatter windows + per-ratio loss curve every ``log_steps`` steps
  (``main.py:160,183-201``).  Silently no-ops when visdom is absent.
- :func:`collect_intermediates` / :func:`vis_phase` — the ``vis`` phase:
  run patches through the net capturing per-layer features and kNN
  indices (flax ``intermediates`` collection replaces the reference's
  ``self.vis`` dict, ``upsampler.py:167-184``), merge patch batches with
  index offsetting (``main.py:319-327``).
- :class:`Painter` — interactive matplotlib 3D picker: click a point,
  see its kNN (``utils/interactive_visualizer.py``).
"""

from __future__ import annotations


from typing import Dict, Optional, Tuple

import numpy as np

from threepu.utils import logger


class VisdomMonitor:
    """Live training monitor; constructing without visdom installed (or
    reachable) degrades to a no-op."""

    def __init__(self, env: str = "main"):
        self._vis = None
        try:
            import visdom  # type: ignore
            self._vis = visdom.Visdom(env=env)
        except Exception:
            logger.warn("visdom unavailable; training monitor disabled")

    def log_train_step(self, step, ratio, loss, state, batch,
                       pred=None, gt_out=None, error=None) -> None:
        """Mirror of ``main.py:184-201``: input / output / gt scatter
        windows plus the running-mean ``error_log`` curve.  ``pred`` /
        ``gt_out`` are the training forward's prediction and re-patched
        gt (``model.predicted`` / ``model.gt``); ``error`` is the
        running-mean weighted loss plotted on the line."""
        if self._vis is None:
            return
        inp, gt = batch
        if gt_out is not None:
            gt = gt_out
        try:
            self._vis.scatter(
                np.asarray(inp[0]), win=f"x{ratio}_input",
                opts=dict(title=f"x{ratio}_input", markersize=2))
            if pred is not None:
                self._vis.scatter(
                    np.asarray(pred[0]), win=f"x{ratio}_output",
                    opts=dict(title=f"x{ratio}_output", markersize=2))
            self._vis.scatter(
                np.asarray(gt[0]), win=f"x{ratio}_gt",
                opts=dict(title=f"x{ratio}_label", markersize=2))
            curve = loss if error is None else error
            self._vis.line(np.array([curve]), np.array([step]),
                           update="append", win=f"x{ratio}_loss",
                           opts=dict(title=f"x{ratio}_loss"))
        except Exception as e:  # dashboard must never kill training
            logger.warn(f"visdom logging failed: {e}")


def collect_intermediates(net, params, patches, ratio: int
                          ) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Forward ``patches (P, N, 3)`` capturing every Level's sown
    features/kNN indices.  Returns ``{"level_l.layer_i": array}`` with
    patch batches merged and kNN indices offset per patch
    (``main.py:319-327``, ``upsampler.py:167-184``)."""
    out, state = net.apply({"params": params}, patches, ratio,
                           train=False, mutable=["intermediates"])
    merged: Dict[str, np.ndarray] = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            else:
                # sow stores a tuple of occurrences
                for i, arr in enumerate(v):
                    key = name if len(v) == 1 else f"{name}_{i}"
                    merged[key] = np.asarray(arr)

    walk(state["intermediates"], "")
    result: Dict[str, np.ndarray] = {}
    for name, arr in merged.items():
        if "nnIdx" in name and arr.ndim == 3:
            b, n, k = arr.shape
            offset = (np.arange(b) * n).reshape(b, 1, 1)
            result[name] = (arr + offset).reshape(1, b * n, k)
        elif arr.ndim == 3:
            result[name] = arr.reshape(1, -1, arr.shape[-1])
        else:
            result[name] = arr
    result["__output__"] = np.asarray(out)
    return result


def vis_phase(flags, net, params, result_dir: str,
              show: Optional[bool] = None) -> None:
    """The CLI ``vis`` phase (``main.py:288-330``): upsample patches of
    each test shape, collect per-layer kNN graphs, open the interactive
    picker per captured layer.

    ``show=None`` auto-detects: headless environments (no ``DISPLAY``)
    render with the Agg backend and return instead of blocking on
    ``plt.show`` per layer."""
    import os

    import jax.numpy as jnp
    from glob import glob

    if show is None:
        show = bool(os.environ.get("DISPLAY"))

    from threepu.io import load
    from threepu.ops import knn_group, gather_nd
    from threepu.ops.fps import _dispatch_fps
    from threepu.ops.normalize import normalize_point_batch_cl
    from threepu.utils.pc_utils import normalize_point_cloud

    num_point = flags.num_point or int(
        flags.num_shape_point * flags.drop_out)
    files = sorted(glob(flags.test_data, recursive=True))
    for path in files:
        data = load(path, flags.num_shape_point)
        data, _, _ = normalize_point_cloud(data)
        shape_b = jnp.asarray(data[None])
        num_patches = max(
            int(data.shape[0] / num_point * flags.patch_num_ratio), 1)
        seeds = gather_nd(shape_b,
                          _dispatch_fps(shape_b, num_patches, None, None))
        patches = knn_group(seeds, shape_b, num_point).neighbors[0]
        norm, _, _ = normalize_point_batch_cl(patches)
        captured = collect_intermediates(net, params, norm,
                                         flags.up_ratio)
        xyz_flat = np.asarray(norm).reshape(-1, 3)
        for name, arr in captured.items():
            if "nnIdx" not in name:
                continue
            # pair the graph with ITS level's input cloud (the
            # reference keeps (old_xyz, nnIdx) per level,
            # main.py:319-330) — levels > 1 run on re-patched clouds
            scope = name.rsplit(".", 1)[0]
            cloud = captured.get(f"{scope}.xyz_in")
            cloud = cloud[0] if cloud is not None else xyz_flat
            painter = Painter("NN Feature")
            painter.nnIdx = arr[0]
            painter.interactive_3D_plot(cloud[:arr[0].shape[0]], name,
                                        show=show)


class Painter:
    """Interactive 3D scatter with click-to-highlight-kNN
    (``utils/interactive_visualizer.py:8-63``)."""

    def __init__(self, title: str = "points"):
        self.title = title
        self.nnIdx: Optional[np.ndarray] = None  # (N, k)
        self._highlight = None

    def interactive_3D_plot(self, xyz: np.ndarray, name: str = "",
                            show: bool = True):
        import matplotlib
        if not show:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(111, projection="3d")
        sc = ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], s=4, picker=5)
        ax.set_title(f"{self.title} {name}")

        def on_pick(event):
            idx = int(np.atleast_1d(event.ind)[0])
            self.highlight(ax, xyz, idx)
            fig.canvas.draw_idle()

        fig.canvas.mpl_connect("pick_event", on_pick)
        if show:
            plt.show()
        return fig, ax

    def highlight(self, ax, xyz: np.ndarray, idx: int):
        if self._highlight is not None:
            try:
                self._highlight.remove()
            except Exception:
                pass
        if self.nnIdx is not None and idx < self.nnIdx.shape[0]:
            nn = self.nnIdx[idx].astype(int)
            nn = nn[nn < xyz.shape[0]]
            pts = xyz[nn]
            self._highlight = ax.scatter(
                pts[:, 0], pts[:, 1], pts[:, 2], s=30, c="red", marker="o")
        return self._highlight
