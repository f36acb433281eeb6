"""Import torch ResNet(-UNet) checkpoints into the Flax ResUNet.

Capability parity with the reference's 2D-weight loading paths
(lib/trainer.py:14-21,49-70,114-127: imagenet / pri3d / 3dmatch state
dicts with shape-filtered merging).  Handles:
* torchvision resnet50/resnet18 state dicts (encoder only),
* full Res50UNet dicts (encoder + up1..up4 + conv0),
* 'module.'/'backbone.' prefixes and classifier keys (dropped),
* conv OIHW -> HWIO transposition; BN weight/bias/running stats.

Unmatched or shape-mismatched tensors are skipped with a report, like the
reference's filtered ``load_state_dict(..., strict=False)`` flow.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _strip_prefix(key: str) -> str:
    """Strip wrapper prefixes from real-world layouts: DataParallel
    ('module.'), pri3d ('backbone.' — reference trainer.py:14-21 strips
    k[9:]), MoCo v2 query encoder ('encoder_q.'; the momentum 'encoder_k.'
    is deliberately NOT stripped so it is skipped), SimCLR/SwAV convnet
    wrappers."""
    for p in (
        "module.", "backbone.", "model.", "encoder_q.", "convnet.",
        "encoder.", "rgb_net.",
    ):
        if key.startswith(p):
            key = key[len(p):]
    return key


def _torch_key_to_flax(key: str):
    """torch state-dict key -> (flax path tuple, leaf kind).

    Returns None for keys we deliberately drop (fc head, num_batches).
    kind ∈ {'conv', 'scale', 'bias', 'mean', 'var'}.
    """
    key = _strip_prefix(key)
    if key.startswith("fc.") or key.endswith("num_batches_tracked"):
        return None
    parts = key.split(".")

    def bn_leaf(leaf):
        return {
            "weight": ("scale", "params"),
            "bias": ("bias", "params"),
            "running_mean": ("mean", "batch_stats"),
            "running_var": ("var", "batch_stats"),
        }[leaf]

    # Encoder keys: conv1/bn1, layer{i}.{j}.{conv,bn}{k}, downsample.{0,1}
    if parts[0] in ("conv1", "bn1") and len(parts) == 2:
        name, leaf = parts
        if name == "conv1":
            return ("encoder", "conv1"), ("kernel", "params")
        leaf_name, coll = bn_leaf(leaf)
        return ("encoder", "bn1", leaf_name), None, coll

    if parts[0].startswith("layer"):
        stage = parts[0]
        block = parts[1]
        mod = parts[2]
        flax_block = f"{stage}_{block}"
        if mod == "downsample":
            sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
            leaf = parts[4]
            if sub == "downsample_conv":
                return ("encoder", flax_block, sub), ("kernel", "params")
            leaf_name, coll = bn_leaf(leaf)
            return ("encoder", flax_block, sub, leaf_name), None, coll
        leaf = parts[3]
        if mod.startswith("conv"):
            return ("encoder", flax_block, mod), ("kernel", "params")
        leaf_name, coll = bn_leaf(leaf)
        return ("encoder", flax_block, mod, leaf_name), None, coll

    # Decoder keys: decoder.up{i}.{conv1,bn1,conv1_2,bn1_2,conv2,bn2},
    # decoder.conv0.{weight,bias}
    if parts[0] == "decoder":
        if parts[1] == "conv0":
            leaf = "kernel" if parts[2] == "weight" else "bias"
            return ("conv0",), (leaf, "params")
        up, mod, leaf = parts[1], parts[2], parts[3]
        if mod.startswith("conv"):
            return (up, mod), ("kernel", "params")
        leaf_name, coll = bn_leaf(leaf)
        return (up, mod, leaf_name), None, coll
    return None


def _set_path(tree: Dict, path: Tuple[str, ...], value) -> bool:
    node = tree
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    if path[-1] not in node:
        return False
    if tuple(node[path[-1]].shape) != tuple(value.shape):
        return False
    node[path[-1]] = value
    return True


def import_torch_resunet(state_dict, variables) -> tuple[dict, dict]:
    """Merge a torch state dict into ResUNet flax ``variables``
    ({'params', 'batch_stats'}).  Returns (new_variables, report)."""
    def to_mutable(d):
        return {k: to_mutable(v) if isinstance(v, dict) else v for k, v in dict(d).items()}

    params = to_mutable(variables["params"])
    stats = to_mutable(variables["batch_stats"])

    loaded, skipped = [], []
    for key, tensor in state_dict.items():
        mapped = _torch_key_to_flax(key)
        if mapped is None:
            skipped.append(key)
            continue
        if len(mapped) == 3:
            path, _, coll = mapped
            value = np.asarray(tensor, np.float32)
            ok = _set_path(stats if coll == "batch_stats" else params, path, value)
        else:
            path, (leaf, coll) = mapped
            value = np.asarray(tensor, np.float32)
            if leaf == "kernel" and value.ndim == 4:  # OIHW -> HWIO
                value = value.transpose(2, 3, 1, 0)
            ok = _set_path(params, path + (leaf,), value)
        (loaded if ok else skipped).append(key)

    report = {"loaded": len(loaded), "skipped": len(skipped), "skipped_keys": skipped[:20]}
    return {"params": params, "batch_stats": stats}, report


def load_backbone2d(path: str, variables):
    """Load a torch .pth checkpoint file (reference init modes 'pri3d' /
    '3dmatch' / 'image_net', trainer.py:49-70) into flax variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    state_dict = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in ckpt.items()}
    return import_torch_resunet(state_dict, variables)
