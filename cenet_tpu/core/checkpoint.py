"""Checkpoint save/restore (Orbax) with the reference's snapshot policies.

Reference policies (SURVEY.md §5):
* Synapse: periodic epoch snapshots every ``eval_interval`` after T/2 plus final.
* ACDC/skin: ``best`` checkpoint gated on val→test improvement, plus final.
* ``--resume`` is a dead flag in the reference (``main_synapse.py:63``); here
  step-level resume is real: every save carries the FULL TrainState — params,
  batch_stats, optimizer state (momentum included) and step — via Orbax
  ``StandardSave``/``StandardRestore``, so a resumed run bit-matches an
  uninterrupted one (tests/test_trainer.py::test_resume_bit_matches_uninterrupted).

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
    """Step-indexed snapshots + named tags ('best', 'final', 'epochN').

    Everything goes through Orbax StandardSave so the optax state pytree
    round-trips structurally (the old npz path flattened tuples into string-keyed
    dicts and could not restore momentum). npz remains only as an orbax-less
    fallback and for torch interchange.
    """

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        if _HAS_ORBAX:
            self._mgr = ocp.CheckpointManager(
                os.path.join(self.directory, "steps"),
                options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
            )
            self._tagger = ocp.StandardCheckpointer()
        else:  # pragma: no cover
            self._mgr = None
            self._tagger = None

    # -- save -----------------------------------------------------------------

    def save(self, step: int, state: Any, metrics: Optional[Dict] = None, tag: Optional[str] = None):
        tree = jax.tree.map(np.asarray, _state_to_tree(state))
        if self._mgr is not None:
            if tag is None:
                self._mgr.save(int(step), args=ocp.args.StandardSave(tree))
                self._mgr.wait_until_finished()
            else:
                self._tagger.save(os.path.join(self.directory, tag), tree, force=True)
                self._tagger.wait_until_finished()
        else:  # pragma: no cover
            _save_npz(os.path.join(self.directory, f"{tag or 'ckpt'}_{step}.npz"), tree)
        if metrics is not None:
            import json

            with open(os.path.join(self.directory, f"metrics_{tag or step}.json"), "w") as f:
                json.dump(metrics, f)

    def save_best(self, state: Any, metrics: Optional[Dict] = None):
        self.save(0, state, metrics=metrics, tag="best")

    # -- restore ----------------------------------------------------------------

    def restore_state(self, template_state: Any, step: Optional[int] = None, tag: Optional[str] = None) -> Any:
        """Restore a full TrainState (opt_state/momentum included) into the
        structure of ``template_state``. ``step=None, tag=None`` → latest step."""
        import dataclasses

        template = _state_to_tree(template_state)
        if self._mgr is None:  # pragma: no cover
            raise FileNotFoundError("orbax unavailable; restore from npz via _load_npz")
        if tag is not None:
            tree = self._tagger.restore(os.path.join(self.directory, tag), target=template)
        else:
            step = step if step is not None else self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no step checkpoints in {self.directory}")
            tree = self._mgr.restore(int(step), args=ocp.args.StandardRestore(template))
        if hasattr(template_state, "params"):
            return dataclasses.replace(
                template_state,
                params=tree["params"],
                batch_stats=tree["batch_stats"],
                opt_state=tree["opt_state"],
                step=tree["step"],
            )
        return tree

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step() if self._mgr is not None else None

    def available_tags(self):
        """'best'/'final' first, then epochN tags in NUMERIC order (lexicographic
        sort would rank 'epoch80' > 'epoch120' and make fallbacks pick an older
        snapshot whenever epoch numbers cross a digit boundary)."""
        epochs = [
            t for t in os.listdir(self.directory)
            if t.startswith("epoch") and t[5:].isdigit() and os.path.isdir(os.path.join(self.directory, t))
        ]
        return [
            t for t in ("best", "final")
            if os.path.isdir(os.path.join(self.directory, t))
        ] + sorted(epochs, key=lambda t: int(t[5:]))

    def has_any(self) -> bool:
        return self.latest_step() is not None or bool(self.available_tags())


def restore_tag_dir(path: str, template_state: Any) -> Any:
    """Restore a full TrainState from a single Orbax checkpoint directory (e.g. a
    path produced by a tagged save: ``<snap>/final``)."""
    import dataclasses

    tree = ocp.StandardCheckpointer().restore(
        os.path.abspath(path), target=_state_to_tree(template_state)
    )
    if hasattr(template_state, "params"):
        return dataclasses.replace(
            template_state,
            params=tree["params"], batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"], step=tree["step"],
        )
    return tree


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
