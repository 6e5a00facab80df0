"""Checkpoint save/restore (Orbax) with the reference's snapshot policies.

Reference policies (SURVEY.md §5):
* Synapse: periodic epoch snapshots every ``eval_interval`` after T/2 plus final.
* ACDC/skin: ``best`` checkpoint gated on val→test improvement, plus final.
* ``--resume`` is a dead flag in the reference; here step-level resume is real.

Also supports importing PyTorch ``.pth`` state dicts through the converter.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        if _HAS_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
            )
        else:
            self._mgr = None

    def save(self, step: int, state: Any, metrics: Optional[Dict] = None, tag: Optional[str] = None):
        tree = jax.tree.map(np.asarray, _state_to_tree(state))
        if self._mgr is not None and tag is None:
            self._mgr.save(step, args=ocp.args.StandardSave(tree))
            self._mgr.wait_until_finished()
        else:
            path = os.path.join(self.directory, f"{tag or 'ckpt'}_{step}.npz" if tag else f"ckpt_{step}.npz")
            _save_npz(path, tree)
        if metrics is not None:
            import json

            with open(os.path.join(self.directory, f"metrics_{tag or step}.json"), "w") as f:
                json.dump(metrics, f)

    def save_best(self, state: Any, metrics: Optional[Dict] = None):
        tree = jax.tree.map(np.asarray, _state_to_tree(state))
        _save_npz(os.path.join(self.directory, "best.npz"), tree)
        if metrics is not None:
            import json

            with open(os.path.join(self.directory, "metrics_best.json"), "w") as f:
                json.dump(metrics, f)

    def restore(self, step: Optional[int] = None, path: Optional[str] = None) -> Dict:
        if path is not None:
            return _load_npz(path)
        if self._mgr is not None:
            step = step if step is not None else self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
            return self._mgr.restore(step)
        raise FileNotFoundError("no checkpoint source given")

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step() if self._mgr is not None else None


def _state_to_tree(state: Any) -> Dict:
    if hasattr(state, "params"):
        return {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
    return state


def _save_npz(path: str, tree: Dict):
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def _load_npz(path: str) -> Dict:
    data = np.load(path, allow_pickle=False)
    tree: Dict = {}
    for key in data.files:
        parts = key.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = data[key]
    return tree


def load_pretrained_encoder(variables: Dict, pth_path: str, encoder_prefix: str = "backbone") -> Dict:
    """Load a torch PVT/ResNet checkpoint into the backbone subtree, filtered like
    the reference (keys present in the model only; loud report instead of silent
    skip — ``encoder.py:75-84``)."""
    from cenet_tpu.convert.torch2jax import convert_state_dict, load_torch_checkpoint

    sd = load_torch_checkpoint(pth_path)
    backbone_vars = {
        c: variables[c][encoder_prefix] for c in variables if encoder_prefix in variables[c]
    }
    new_backbone, report = convert_state_dict(sd, backbone_vars, strict=False)
    out = {c: dict(variables[c]) for c in variables}
    for c in new_backbone:
        out[c][encoder_prefix] = new_backbone[c]
    if report["missing"]:
        import logging

        logging.getLogger(__name__).warning(
            "pretrained load: %d params not found in %s", len(report["missing"]), pth_path
        )
    return out
