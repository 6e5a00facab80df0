"""PyTorch → JAX checkpoint converter for CENet/CENetOrg/PVTv2/ResNet weights.

Strategy: walk OUR initialized variable tree and derive, for every leaf, the torch
state_dict key plus the layout transform (OIHW→HWIO for convs, (I,O,kh,kw)→HWIO for
transposed convs, (out,in)→(in,out) for linears, (1,C,1,1)→(C,) squeezes). Coverage
is therefore total by construction: any parameter whose torch key is missing from
the checkpoint is reported, as is any checkpoint key we never consumed (matching the
reference's filtered-load semantics, ``encoder.py:75-84``, but loud instead of
silent).

Name-scheme notes (reference torch modules):
* monai ``Convolution`` wrappers add a trailing ``.conv`` (UnetResBlock conv1 →
  ``conv1.conv.weight``).
* EUCB's Sequential indices: ``up_dwc.1`` conv, ``up_dwc.2`` BN, ``pwc.0`` conv.
* MultiOrderDWConv pool branch: ``dlps.3.1`` conv, ``dlps.3.2`` BN.
* cenet_org renames: ``mca``→``attn``, ``ccu``→``crm``, decoder up-blocks
  ``up{i}``→``eucb{i}``, DSEB→SkipEnhancer.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def _unflatten(items):
    root: Dict = {}
    for path, v in items:
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return root


# paths whose final conv is a monai Convolution wrapper in torch (extra ".conv")
_MONAI_CONV_RE = re.compile(r"(conv1|conv2|conv3|up)$")
# UnetResBlock norm layers are monai get_norm_layer → plain BatchNorm2d (no wrapper)


_UP_MODULE_RE = re.compile(r"^(up\d?|eucb\d)$")


def torch_key_for(
    path: Tuple[str, ...],
    collection: str,
    model_version: str = "cenet",
    siblings: Optional[Dict[str, set]] = None,
) -> str:
    """Map a flax variable path to the reference torch state_dict key.

    ``siblings`` maps "/".join(parent-path) → set of child module names; it is used
    to disambiguate structurally identical names across up-block kinds (EUCB's
    ``bn`` → ``up_dwc.2`` vs UpConv's ``bn`` → ``up.2``).
    """
    siblings = siblings or {}
    parts: List[str] = list(path)
    leaf = parts.pop()

    # collection leaf naming
    if collection == "batch_stats":
        leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
    leaf_map = {"fc1_weight": "fc1.weight", "fc2_weight": "fc2.weight"}
    leaf = leaf_map.get(leaf, leaf)

    def sibs(i: int) -> set:
        return siblings.get("/".join(parts[:i]), set())

    segs: List[str] = []
    i = 0
    while i < len(parts):
        s = parts[i]
        in_up_block = i > 0 and _UP_MODULE_RE.fullmatch(parts[i - 1]) is not None
        m = re.fullmatch(r"block(\d)_(\d+)", s)  # PVT blocks: block1_0 → block1.0
        if m:
            segs.append(f"block{m.group(1)}.{m.group(2)}")
            i += 1
            continue
        m = re.fullmatch(r"layer(\d)_(\d+)", s)  # ResNet layers
        if m:
            segs.append(f"layer{m.group(1)}.{m.group(2)}")
            i += 1
            continue
        if s == "downsample_conv":
            segs.append("downsample.0")
            i += 1
            continue
        if s == "downsample_bn":
            segs.append("downsample.1")
            i += 1
            continue
        m = re.fullmatch(r"dlp(\d)", s)  # MultiOrderDWConv branches
        if m:
            segs.append(f"dlps.{m.group(1)}")
            i += 1
            continue
        if s == "pool_conv":
            segs.append("dlps.3.1")
            i += 1
            continue
        if s == "pool_bn":
            segs.append("dlps.3.2")
            i += 1
            continue
        # up-block internals, disambiguated by our module structure:
        #   EUCB:   up_dwc → up_dwc.1, bn → up_dwc.2, pwc → pwc.0
        #   UpConv: conv → up.1, bn → up.2
        #   UpRb:   rb/* → up.1.*
        #   UpTConv: up → up (monai Convolution wrapper adds .conv later)
        if in_up_block:
            sib = sibs(i)
            if s == "up_dwc":
                segs.append("up_dwc.1")
                i += 1
                continue
            if s == "bn":
                segs.append("up_dwc.2" if "up_dwc" in sib else "up.2")
                i += 1
                continue
            if s == "conv" and "bn" in sib:
                segs.append("up.1")
                i += 1
                continue
            if s == "rb":
                segs.append("up.1")
                i += 1
                continue
            if s == "pwc":
                segs.append("pwc.0")
                i += 1
                continue
        if s == "pwc" and not any("srm" in g for g in segs):
            segs.append("pwc.0")
            i += 1
            continue
        segs.append(s)
        i += 1

    key = ".".join(segs + [leaf]) if segs else leaf

    if model_version == "cenet_org":
        key = _org_rename(key)

    # OutHead naming (cenet): our out/{rb,out_rb,out_conv} → torch out.{rb.0, out.0, out.1}
    key = key.replace("out.out_rb.", "out.out.0.")
    key = key.replace("out.out_conv.conv.", "out.out.1.conv.conv.")
    key = re.sub(r"^out\.rb\.", "out.rb.0.", key)

    # monai Convolution wrapper: conv1/conv2/conv3 inside Unet blocks, UpTConv's up
    key = re.sub(r"\.(conv1|conv2|conv3)\.(weight|bias)$", r".\1.conv.\2", key)
    key = re.sub(r"\.up\.(weight|bias)$", r".up.conv.\1", key)
    return key


def _org_rename(key: str) -> str:
    key = key.replace(".mca.", ".attn.")
    key = key.replace(".ccu.", ".crm.")
    key = re.sub(r"decoder\.up(\d)\.", r"decoder.eucb\1.", key)
    key = key.replace("conv_stem_bn.", "conv.1.")
    key = key.replace("conv_stem.", "conv.0.")
    key = key.replace("enc_rb.", "enc.0.")
    key = key.replace("up_rb.", "up.1.")
    # UnetOutBlock head: our out/conv → torch out.conv.conv (monai Convolution wrapper)
    key = re.sub(r"^out\.conv\.(weight|bias)$", r"out.conv.conv.\1", key)
    return key


def _to_jax_layout(torch_arr: np.ndarray, our_shape: Tuple[int, ...], path: Tuple[str, ...]) -> np.ndarray:
    t = np.asarray(torch_arr)
    p = "/".join(path)
    if t.ndim == 4 and len(our_shape) == 4:
        if "up/weight" in p and t.shape[0] == our_shape[2] and ("uptc" in p or t.shape[:2] == (our_shape[2], our_shape[3])):
            # ConvTranspose2d (I, O, kh, kw) → (kh, kw, I, O)
            cand = t.transpose(2, 3, 0, 1)
            if cand.shape == tuple(our_shape):
                return cand
        cand = t.transpose(2, 3, 1, 0)  # OIHW → HWIO
        if cand.shape == tuple(our_shape):
            return cand
        cand2 = t.transpose(2, 3, 0, 1)  # (I,O,kh,kw) → HWIO
        if cand2.shape == tuple(our_shape):
            return cand2
        raise ValueError(f"shape mismatch at {p}: torch {t.shape} vs ours {our_shape}")
    if t.ndim == 2 and len(our_shape) == 2:
        if t.T.shape == tuple(our_shape):
            return t.T
        if t.shape == tuple(our_shape):
            return t
        raise ValueError(f"shape mismatch at {p}: {t.shape} vs {our_shape}")
    if t.shape == tuple(our_shape):
        return t
    if t.size == int(np.prod(our_shape)):
        return t.reshape(our_shape)  # (1,C,1,1) gates → (C,), Conv1d shapes, etc.
    raise ValueError(f"cannot map {p}: torch {t.shape} vs ours {our_shape}")


def convert_state_dict(
    state_dict: Dict[str, Any],
    variables: Dict[str, Any],
    model_version: str = "cenet",
    strict: bool = True,
    prefix: str = "",
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Fill our variable tree from a torch state_dict.

    Returns (new_variables, report) where report lists 'missing' (our params with no
    torch key) and 'unused' (torch keys never consumed).
    """
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in state_dict.items()}
    used = set()
    missing: List[str] = []
    out = {}
    # sibling map for structural disambiguation (across all collections)
    siblings: Dict[str, set] = {}
    for collection in variables:
        for path, _ in _flatten(variables[collection]):
            for j in range(len(path)):
                siblings.setdefault("/".join(path[:j]), set()).add(path[j])
    for collection in variables:
        items = []
        for path, leaf in _flatten(variables[collection]):
            tkey = torch_key_for(path, collection, model_version, siblings)
            if tkey in sd:
                arr = _to_jax_layout(np.asarray(sd[tkey]), tuple(np.shape(leaf)), path)
                items.append((path, np.asarray(arr, dtype=np.asarray(leaf).dtype)))
                used.add(tkey)
            else:
                missing.append(f"{collection}:{'/'.join(path)} (expected torch key '{tkey}')")
                items.append((path, leaf))
        out[collection] = _unflatten(items)
    unused = [k for k in sd if k not in used and not k.endswith("num_batches_tracked")]
    report = {"missing": missing, "unused": unused}
    if strict and (missing or unused):
        raise KeyError(f"conversion mismatch: missing={missing[:10]}..., unused={unused[:10]}...")
    return out, report


def expected_torch_keys(variables: Dict[str, Any], model_version: str = "cenet") -> Dict[str, str]:
    """{collection:our/path → torch key} for every leaf (testing/debugging aid)."""
    siblings: Dict[str, set] = {}
    for collection in variables:
        for path, _ in _flatten(variables[collection]):
            for j in range(len(path)):
                siblings.setdefault("/".join(path[:j]), set()).add(path[j])
    out = {}
    for collection in variables:
        for path, _ in _flatten(variables[collection]):
            out[f"{collection}:" + "/".join(path)] = torch_key_for(path, collection, model_version, siblings)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state_dict into numpy without CUDA."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
