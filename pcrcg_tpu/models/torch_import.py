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


def _kpfcnn_key_map(key: str):
    """Reference KPFCNN state-dict key (models/architectures.py:35-176,
    models/blocks.py, models/gcn.py) -> (collection, flax path, transform).

    transform: None = copy, 't' = Linear [out,in] -> kernel [in,out],
    'conv1d' = Conv1d [out,in,1] -> [in,out], 'conv2d' = Conv2d
    [out,in,1,1] -> [in,out].  Raises KeyError for keys we cannot map
    (the caller pre-filters keys that carry no flax state, e.g.
    InstanceNorm running stats)."""
    parts = key.split(".")
    if parts[0] in ("encoder_blocks", "decoder_blocks"):
        blk = ("encoder_" if parts[0][0] == "e" else "decoder_") + parts[1]
        rest = parts[2:]
        if rest[0] == "KPConv":
            if rest[1] == "weights":
                return "params", (blk, "KPConv", "weights"), None
            if rest[1] == "kernel_points":
                return "constants", (blk, "KPConv", "kernel_points"), None
        if rest[0] in ("unary1", "unary2", "unary_shortcut") and rest[1:] == ["mlp", "weight"]:
            return "params", (blk, rest[0], "mlp", "kernel"), "t"
        if rest == ["mlp", "weight"]:  # decoder unary / last_unary
            return "params", (blk, "mlp", "kernel"), "t"
        # BatchNormBlock: InstanceNorm1d (use_bn=True, every shipped
        # config) has no parameters; the no-norm variant's learned bias
        # maps onto our NormBlock bias (norm / norm_conv / unary*.norm).
        if rest[-1] == "bias" and rest[-2].startswith("batch_norm"):
            ours = {"batch_norm": "norm", "batch_norm_conv": "norm_conv"}[rest[-2]]
            return "params", (blk,) + tuple(rest[:-2]) + (ours, "bias"), None
        raise KeyError(key)
    if parts[0] in ("bottle", "proj_gnn", "proj_score", "node_overlap_predict"):
        if parts[1] == "weight":
            return "params", (parts[0], "kernel"), "conv1d"
        return "params", (parts[0], "bias"), None
    if parts[0] == "epsilon":
        return "params", ("epsilon",), None
    if parts[0] == "gnn":
        i = parts[2]
        sub = parts[3]
        if sub.startswith("conv"):  # SelfAttention Conv2d, bias=False
            return "params", ("gnn", f"self_{i}", sub, "kernel"), "conv2d"
        if sub == "attn":
            if parts[4] == "proj":
                mod = {"0": "proj_q", "1": "proj_k", "2": "proj_v"}[parts[5]]
                leaf = parts[6]
            else:
                mod, leaf = "merge", parts[5]
            path = ("gnn", f"cross_{i}", "attn", mod)
            if leaf == "weight":
                return "params", path + ("kernel",), "conv1d"
            return "params", path + ("bias",), None
        if sub == "mlp":  # Sequential [Conv1d, InstanceNorm, ReLU, Conv1d]
            mod = {"0": "mlp1", "3": "mlp2"}[parts[4]]
            if parts[5] == "weight":
                return "params", ("gnn", f"cross_{i}", mod, "kernel"), "conv1d"
            return "params", ("gnn", f"cross_{i}", mod, "bias"), None
        raise KeyError(key)
    if parts[0] == "folding1":  # Sequential [Linear, ReLU]*5
        name = f"folding1_{int(parts[1]) // 2}"
        if parts[2] == "weight":
            return "params", (name, "kernel"), "t"
        return "params", (name, "bias"), None
    if parts[0] in ("linear1", "linear2"):
        if parts[1] == "weight":
            return "params", (parts[0], "kernel"), "t"
        return "params", (parts[0], "bias"), None
    raise KeyError(key)


def import_kpfcnn_state_dict(state_dict, variables, strict: bool = True):
    """Import a reference-format torch KPFCNN state dict into our KPFCNN
    flax ``variables`` ({'params', 'constants'}): trained weights AND the
    checkpoint's kernel-point dispositions (the reference jitters each
    layer's kernel at init, kernel_points.py:433-468 — using the
    checkpoint's exact dispositions is required for numerical parity).

    Returns (new_variables, report).  With ``strict`` (default) raises on
    any unmapped/mismatched checkpoint key or untouched flax KPConv/mlp
    leaf; otherwise skips and reports, like the reference's
    ``load_state_dict(strict=False)`` pretrain flow (lib/trainer.py)."""
    def to_mutable(d):
        return {k: to_mutable(v) if isinstance(v, dict) else v for k, v in dict(d).items()}

    out = {k: to_mutable(v) for k, v in dict(variables).items()}
    loaded, skipped, errors = [], [], []
    touched = set()
    for key, tensor in state_dict.items():
        k = key[len("module."):] if key.startswith("module.") else key
        if k.endswith("num_batches_tracked") or ".running_" in k:
            skipped.append(key)
            continue
        try:
            coll, path, tf = _kpfcnn_key_map(k)
        except KeyError:
            errors.append(f"unmapped key: {key}")
            continue
        value = np.asarray(
            tensor.detach().numpy() if hasattr(tensor, "detach") else tensor,
            np.float32,
        )
        if tf == "t":
            value = value.T
        elif tf == "conv1d":
            value = value[:, :, 0].T
        elif tf == "conv2d":
            value = value[:, :, 0, 0].T
        tree = out.get(coll)
        if tree is None or not _set_path(tree, path, value):
            errors.append(f"no match/shape for: {key} -> {coll}/{'/'.join(path)}")
            continue
        loaded.append(key)
        touched.add((coll,) + path)
    # Flax-side coverage: in strict mode every weight-bearing leaf of the
    # model must have been written by the checkpoint — a truncated or
    # different-architecture checkpoint otherwise leaves random-init
    # weights in place silently.
    untouched = []

    def check(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                check(v, path + (k,))
            elif path + (k,) not in touched:
                untouched.append("/".join(path + (k,)))

    for coll in ("params", "constants"):
        if coll in out:
            check(out[coll], (coll,))
    if untouched:
        errors.extend(f"not in checkpoint: {p}" for p in untouched)
    if strict and errors:
        raise ValueError(
            "KPFCNN import failed:\n  " + "\n  ".join(errors[:20])
            + (f"\n  (+{len(errors)-20} more)" if len(errors) > 20 else "")
        )
    report = {
        "loaded": len(loaded), "skipped": len(skipped), "errors": errors,
    }
    return out, report


def export_kpfcnn_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_kpfcnn_state_dict`: our KPFCNN flax
    ``variables`` ({'params', 'constants'}) -> a reference-format torch
    state dict (numpy values), so TPU-trained weights run in the
    reference's torch pipeline.  Round-trip tested."""
    out: Dict[str, np.ndarray] = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            else:
                emit(path + (k,), np.asarray(v, np.float32))

    def emit(path, value):
        head = path[0]
        if head.startswith(("encoder_", "decoder_")):
            i = head.split("_")[1]
            blk = ("encoder_blocks." if head[0] == "e" else "decoder_blocks.") + i
            rest = path[1:]
            if rest == ("KPConv", "weights") or rest == ("KPConv", "kernel_points"):
                out[f"{blk}.KPConv.{rest[1]}"] = value
            elif rest[-2:] == ("mlp", "kernel"):
                mods = ".".join(rest[:-2] + ("mlp",))
                out[f"{blk}.{mods}.weight"] = value.T
            elif rest[-1] == "bias" and rest[-2] in ("norm", "norm_conv"):
                ref_norm = {"norm": "batch_norm", "norm_conv": "batch_norm_conv"}[rest[-2]]
                mods = ".".join(rest[:-2] + (ref_norm,))
                out[f"{blk}.{mods}.bias"] = value
            else:
                raise KeyError("/".join(path))
        elif head in ("bottle", "proj_gnn", "proj_score", "node_overlap_predict"):
            if path[1] == "kernel":
                out[f"{head}.weight"] = value.T[:, :, None]
            else:
                out[f"{head}.bias"] = value
        elif head == "epsilon":
            out["epsilon"] = value
        elif head == "gnn":
            i = path[1].split("_")[1]
            if path[1].startswith("self_"):
                out[f"gnn.layers.{i}.{path[2]}.weight"] = value.T[:, :, None, None]
            elif path[2] == "attn":
                ref_mod = {"proj_q": "proj.0", "proj_k": "proj.1",
                           "proj_v": "proj.2", "merge": "merge"}[path[3]]
                if path[4] == "kernel":
                    out[f"gnn.layers.{i}.attn.{ref_mod}.weight"] = value.T[:, :, None]
                else:
                    out[f"gnn.layers.{i}.attn.{ref_mod}.bias"] = value
            else:
                ref_mod = {"mlp1": "mlp.0", "mlp2": "mlp.3"}[path[2]]
                if path[3] == "kernel":
                    out[f"gnn.layers.{i}.{ref_mod}.weight"] = value.T[:, :, None]
                else:
                    out[f"gnn.layers.{i}.{ref_mod}.bias"] = value
        elif head.startswith("folding1_"):
            k = int(head.split("_")[1]) * 2
            leaf = "weight" if path[1] == "kernel" else "bias"
            out[f"folding1.{k}.{leaf}"] = value.T if leaf == "weight" else value
        elif head in ("linear1", "linear2"):
            leaf = "weight" if path[1] == "kernel" else "bias"
            out[f"{head}.{leaf}"] = value.T if leaf == "weight" else value
        else:
            raise KeyError("/".join(path))

    walk(variables["params"], ())
    for blk, sub in variables.get("constants", {}).items():
        out[f"encoder_blocks.{blk.split('_')[1]}.KPConv.kernel_points"] = np.asarray(
            sub["KPConv"]["kernel_points"], np.float32
        )
    return out


def load_kpfcnn(path: str, variables, strict: bool = True):
    """Load a reference torch KPFCNN checkpoint file (the reference's
    ``_load_pretrain`` 'state_dict' layout, lib/trainer.py:163-184) into
    our KPFCNN variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return import_kpfcnn_state_dict(ckpt, variables, strict=strict)


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
