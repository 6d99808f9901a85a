"""Checkpointing: native ``.npz`` format plus reference ``.pth`` import.

Reference equivalent: ``utils/pytorch_utils.py`` —
``save_network`` writes ``{"states": state_dict, "step": str(step)}``
(``:7-15``); ``load_network`` tolerates partial restores by dropping
keys absent from the current model and unwraps ``DataParallel``
prefixes (``:29-39``), returning the stored step (``:48-51``).

The native format flattens the flax param pytree into ``params/<path>``
npz entries with a ``step`` scalar, so checkpoints are plain numpy
archives: inspectable, portable, no pickle.  ``import_pth`` converts a
reference torch checkpoint (1x1 conv stacks) into the flax tree — the
bridge that lets ``final_poisson.pth``-style weights run on TPU.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

PARAM_PREFIX = "params/"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_checkpoint(path: str, params: Any, step: int = 0,
                    **extra: np.ndarray) -> None:
    """Write ``{params, step, **extra}`` as an ``.npz`` archive."""
    tree = params if "params" in params else {"params": params}
    arrays = _flatten(tree)
    arrays["step"] = np.asarray(step, np.int64)
    arrays.update(extra)
    dirname = os.path.dirname(path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    np.savez(path, **arrays)


def load_checkpoint(path: str, target_params: Optional[Any] = None
                    ) -> Tuple[Dict[str, Any], int]:
    """Load a native checkpoint.  With ``target_params``, keys absent
    from the target are dropped (the reference's forward-compatible
    partial restore, ``pytorch_utils.py:32-39``) and missing keys keep
    the target's values."""
    with np.load(path) as data:
        step = int(data["step"]) if "step" in data else 0
        flat = {k: data[k] for k in data.files if k.startswith("params/")}
    flat = {k[len("params/"):]: v for k, v in flat.items()}
    if target_params is not None:
        target = target_params.get("params", target_params)
        target_flat = _flatten(target)
        merged = dict(target_flat)
        for k, v in flat.items():
            if k in target_flat:
                merged[k] = v
        flat = merged
    return {"params": _unflatten(flat)}, step


OPT_PREFIX = "opt/"
OPT_TREE_KEY = "opt_treedef"


def _opt_fingerprint(opt_state: Any) -> str:
    """Structural fingerprint of an optax state: the treedef repr plus
    per-leaf key paths.  Pins the optimizer *structure* — chain
    composition and state types (swapping Adam for SGD-with-momentum,
    adding/removing a clip stage, a schedule count leaf appearing) —
    which shape-matching alone cannot.  It can NOT detect
    hyperparameter-only changes (Adam betas/lr live in the transform
    closure, not the state); those resume with the old moments, which
    is also what restoring with the new betas *means*."""
    import jax

    treedef = jax.tree_util.tree_structure(opt_state)
    paths = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_leaves_with_path(opt_state)]
    return repr(treedef) + "|" + "|".join(paths)


def save_train_checkpoint(path: str, params: Any, opt_state: Any,
                          step: int = 0) -> None:
    """Full-state checkpoint: params + optimizer state + step.

    The reference only persists ``{params, step}`` (Adam moments are
    lost on restart, ``pytorch_utils.py:7-15``); production training
    needs exact resume.  ``opt_state`` (any optax state pytree) is
    stored as ordered ``opt/<i>`` leaf arrays plus a structural
    fingerprint, so restoring verifies the optimizer configuration
    instead of trusting shape coincidence.
    """
    import jax

    arrays = _flatten({"params": params.get("params", params)})
    arrays["step"] = np.asarray(step, np.int64)
    for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
        arrays[f"{OPT_PREFIX}{i:05d}"] = np.asarray(leaf)
    arrays[OPT_TREE_KEY] = np.asarray(_opt_fingerprint(opt_state))
    dirname = os.path.dirname(path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    np.savez(path, **arrays)


def load_opt_state(path: str, target_opt_state: Any) -> Optional[Any]:
    """Restore the optimizer state stored by
    :func:`save_train_checkpoint`; ``target_opt_state`` (a freshly
    initialized state of the SAME optimizer) supplies the tree
    structure and leaf dtypes.  Returns ``None`` when the checkpoint
    has no optimizer state, its leaves don't line up, or its stored
    structural fingerprint disagrees with the target's (a changed
    optimizer structure whose state happens to be shape-compatible must
    NOT silently restore stale moments); mismatches warn loudly so an
    'exact resume' that fell back to fresh state is visible.
    """
    import jax

    from threepu.utils.logger import warn

    with np.load(path) as data:
        keys = sorted(k for k in data.files if k.startswith(OPT_PREFIX))
        leaves = [data[k] for k in keys]
        stored_fp = (str(data[OPT_TREE_KEY]) if OPT_TREE_KEY in data
                     else None)
    if not leaves:
        return None
    treedef = jax.tree_util.tree_structure(target_opt_state)
    target_leaves = jax.tree_util.tree_leaves(target_opt_state)
    if stored_fp is not None and stored_fp != _opt_fingerprint(
            target_opt_state):
        warn(f"optimizer state in {path} was saved with a different "
             "optimizer configuration; resuming with FRESH optimizer "
             "state (params/step restore normally)")
        return None
    if len(leaves) != len(target_leaves):
        warn(f"optimizer state in {path} has {len(leaves)} leaves, "
             f"expected {len(target_leaves)}; resuming with FRESH "
             "optimizer state")
        return None
    for got, want in zip(leaves, target_leaves):
        if np.shape(got) != np.shape(want):
            warn(f"optimizer leaf shape mismatch in {path} "
                 f"({np.shape(got)} vs {np.shape(want)}); resuming "
                 "with FRESH optimizer state")
            return None
    leaves = [np.asarray(g, dtype=np.asarray(w).dtype)
              for g, w in zip(leaves, target_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ----------------------------------------------------------------- .pth
def _torch_key_to_flax(key: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """Map a reference state-dict key to (flax path, 'kernel'|'bias').

    Reference module names (``network/upsampler.py:209-230``,
    ``network/layers.py:14-20``):
      levels.level_1.layer0.conv.weight          -> level_1/layer0/conv
      levels.level_1.layer1.mlps.0.weight        -> level_1/layer1/mlps_0
      levels.level_1.layer2_prep.conv.weight     -> level_1/layer2_prep/conv
      levels.level_1.up_layer.up_layer1.conv.w   -> level_1/up_layer1/conv
      levels.level_1.fc_layer1.conv.weight       -> level_1/fc_layer1/conv
    """
    key = re.sub(r"^module\.", "", key)      # DataParallel unwrap
    key = re.sub(r"^levels\.", "", key)
    key = key.replace("up_layer.", "")       # flatten the Sequential
    key = re.sub(r"mlps\.(\d+)", r"mlps_\1", key)
    parts = key.split(".")
    if parts[-1] == "weight":
        leaf = "kernel"
    elif parts[-1] == "bias":
        leaf = "bias"
    else:
        return None
    path = [p for p in parts[:-1]]
    return tuple(path), leaf


def _torch_weight_to_kernel(w: np.ndarray) -> np.ndarray:
    """torch 1x1 conv weight (out, in, 1[, 1]) or linear (out, in) ->
    flax dense kernel (in, out)."""
    while w.ndim > 2:
        assert w.shape[-1] == 1, f"non-1x1 conv kernel {w.shape}"
        w = w[..., 0]
    return np.ascontiguousarray(w.T)


def import_pth(path: str, target_params: Optional[Any] = None
               ) -> Tuple[Dict[str, Any], int]:
    """Convert a reference ``.pth`` checkpoint to a flax param tree.

    Accepts the reference container ``{"states": state_dict, "step": s}``
    (``pytorch_utils.py:10-12``) or a bare state dict.  Returns
    ``({"params": tree}, step)``; with ``target_params`` the restore is
    partial exactly like :func:`load_checkpoint`.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "states" in blob:
        state = blob["states"]
        step = int(blob.get("step", 0) or 0)
    else:
        state = blob
        step = 0

    flat: Dict[str, np.ndarray] = {}
    for key, value in state.items():
        mapped = _torch_key_to_flax(key)
        if mapped is None:
            continue
        pth, leaf = mapped
        value = value.detach().cpu().numpy()
        if leaf == "kernel":
            value = _torch_weight_to_kernel(value)
        flat["/".join(pth) + "/" + leaf] = value

    if target_params is not None:
        target = target_params.get("params", target_params)
        target_flat = _flatten(target)
        merged = dict(target_flat)
        matched = 0
        for k, v in flat.items():
            if k in target_flat:
                if target_flat[k].shape != v.shape:
                    raise ValueError(
                        f"shape mismatch importing {k}: checkpoint "
                        f"{v.shape} vs model {target_flat[k].shape}")
                merged[k] = v
                matched += 1
        flat = merged
    return {"params": _unflatten(flat)}, step


def save_pth(path: str, params: Any, step: int = 0,
             label: Optional[str] = None,
             epoch: Optional[int] = None) -> str:
    """Write a reference-loadable torch checkpoint.

    Mirrors ``utils/pytorch_utils.py:7-15`` (``save_network``): the file
    holds ``{"states": state_dict, "step": str(step)}``.  With ``label``
    and ``epoch``, ``path`` is treated as a directory and the file is
    named ``{label}_{epoch}.pth`` like the reference.  Returns the path
    written.  Round trip: :func:`import_pth` and the reference's
    ``load_network`` both restore it.
    """
    import torch

    blob = export_reference_state(params, step)
    blob["states"] = {k: torch.from_numpy(np.array(v, copy=True))
                      for k, v in blob["states"].items()}
    if label is not None and epoch is not None:
        os.makedirs(path, exist_ok=True)
        path = os.path.join(path, f"{label}_{epoch}.pth")
    else:
        dirname = os.path.dirname(path)
        if dirname:
            os.makedirs(dirname, exist_ok=True)
    torch.save(blob, path)
    return path


def export_reference_state(params: Any, step: int = 0) -> Dict[str, Any]:
    """Reverse bridge: flax tree -> reference-named torch state dict
    (numpy values), for users moving back or for parity tooling."""
    tree = params.get("params", params)
    flat = _flatten(tree)
    state: Dict[str, np.ndarray] = {}
    for key, value in flat.items():
        parts = key.split("/")
        leaf = parts[-1]
        path = parts[:-1]
        name = ".".join(path)
        name = re.sub(r"mlps_(\d+)", r"mlps.\1", name)
        name = re.sub(r"\b(up_layer\d)\b", r"up_layer.\1", name)
        if re.match(r"^level_\d+", name):
            name = "levels." + name
        if leaf == "kernel":
            w = value.T  # (out, in)
            # the reference's *_prep layers are Conv1d (one trailing 1),
            # everything else is Conv2d 1x1 (two trailing 1s)
            if "_prep" in name:
                w = w[..., None]
            else:
                w = w[..., None, None]
            state[name + ".weight"] = np.ascontiguousarray(w)
        else:
            state[name + ".bias"] = value
    return {"states": state, "step": str(step)}
