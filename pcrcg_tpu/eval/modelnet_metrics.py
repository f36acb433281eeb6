"""ModelNet registration metrics (DCP/RPMNet protocol).

Capability parity with reference lib/tester.py:248-340: per-pair euler-angle
r_mse/r_mae, translation t_mse/t_mae, isotropic rotation/translation errors
(err_r_deg, err_t), modified Chamfer distance, and summarize_metrics'
rmse/mean aggregation; plus the ModelnetTester flow (tester.py:343-437:
top-450 sampling, RANSAC n=3 at 0.02)."""
from __future__ import annotations

from typing import Dict

import numpy as np


def dcm2euler_xyz(mats: np.ndarray) -> np.ndarray:
    """Rotation matrices [N,3,3] -> intrinsic-xyz euler angles in degrees
    (scipy Rotation.as_euler('xyz') convention used at tester.py:264-265)."""
    out = np.zeros((mats.shape[0], 3))
    for i, m in enumerate(mats):
        sy = -m[2, 0]
        sy = np.clip(sy, -1.0, 1.0)
        y = np.arcsin(sy)
        if abs(sy) < 1.0 - 1e-9:
            x = np.arctan2(m[2, 1], m[2, 2])
            z = np.arctan2(m[1, 0], m[0, 0])
        else:  # gimbal lock
            x = np.arctan2(-m[1, 2], m[1, 1])
            z = 0.0
        out[i] = [x, y, z]
    return np.degrees(out)


def _transform(g: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ g[..., :3, :3].swapaxes(-1, -2) + g[..., None, :3, 3]


def _inverse(g: np.ndarray) -> np.ndarray:
    rot = g[..., :3, :3]
    t = g[..., :3, 3]
    inv_rot = rot.swapaxes(-1, -2)
    inv_t = -np.einsum("...ij,...j->...i", inv_rot, t)
    return np.concatenate([inv_rot, inv_t[..., None]], axis=-1)


def _concat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    rot = a[..., :3, :3] @ b[..., :3, :3]
    t = np.einsum("...ij,...j->...i", a[..., :3, :3], b[..., :3, 3]) + a[..., :3, 3]
    return np.concatenate([rot, t[..., None]], axis=-1)


def compute_metrics(
    points_src: np.ndarray,  # [B,N,3] (transformed source fed to the model)
    points_ref: np.ndarray,  # [B,M,3]
    points_raw: np.ndarray,  # [B,R,3] clean full cloud
    gt_transforms: np.ndarray,  # [B,3,4] src->ref
    pred_transforms: np.ndarray,  # [B,3,4]
) -> Dict[str, np.ndarray]:
    r_gt = dcm2euler_xyz(gt_transforms[:, :3, :3])
    r_pred = dcm2euler_xyz(pred_transforms[:, :3, :3])
    t_gt = gt_transforms[:, :3, 3]
    t_pred = pred_transforms[:, :3, 3]
    r_mse = np.mean((r_gt - r_pred) ** 2, axis=1)
    r_mae = np.mean(np.abs(r_gt - r_pred), axis=1)
    t_mse = np.mean((t_gt - t_pred) ** 2, axis=1)
    t_mae = np.mean(np.abs(t_gt - t_pred), axis=1)

    concatenated = _concat(_inverse(gt_transforms), pred_transforms)
    rot_trace = np.trace(concatenated[:, :3, :3], axis1=1, axis2=2)
    err_r_deg = np.degrees(np.arccos(np.clip(0.5 * (rot_trace - 1), -1.0, 1.0)))
    err_t = np.linalg.norm(concatenated[:, :3, 3], axis=-1)

    # Modified Chamfer (tester.py:280-286)
    src_transformed = _transform(pred_transforms, points_src)
    src_clean = _transform(_concat(pred_transforms, _inverse(gt_transforms)), points_raw)

    def min_sq(a, b):  # [B,N,3],[B,M,3] -> [B,N]
        d = np.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1)
        return d.min(-1)

    chamfer = min_sq(src_transformed, points_raw).mean(1) + min_sq(points_ref, src_clean).mean(1)
    return {
        "r_mse": r_mse,
        "r_mae": r_mae,
        "t_mse": t_mse,
        "t_mae": t_mae,
        "err_r_deg": err_r_deg,
        "err_t": err_t,
        "chamfer_dist": chamfer,
    }


def summarize_metrics(metrics: Dict[str, np.ndarray]) -> Dict[str, float]:
    out = {}
    for k, v in metrics.items():
        if k.endswith("mse"):
            out[k[:-3] + "rmse"] = float(np.sqrt(np.mean(v)))
        elif k.startswith("err"):
            out[k + "_mean"] = float(np.mean(v))
            out[k + "_rmse"] = float(np.sqrt(np.mean(v**2)))
        else:
            out[k] = float(np.mean(v))
    return out


class ModelnetTester:
    """Estimates each pair's transform (top-450 sampling, RANSAC n=3 at
    0.02 — tester.py:389-407) and reports the DCP/RPMNet metric summary."""

    def __init__(self, cfg, model, variables):
        self.cfg = cfg
        self.model = model
        self.variables = variables

    def run(self, loader, n_points: int = 450, key=None) -> Dict[str, float]:
        import jax

        from pcrcg_tpu.eval.tester import register_pair_jit

        key = key if key is not None else jax.random.key(self.cfg.seed)
        preds, gts, srcs, refs, raws = [], [], [], [], []
        for batch, images in loader:
            for b in range(batch.batch_size):
                key, sub = jax.random.split(key)
                res = register_pair_jit(
                    self.model, self.cfg, self.variables,
                    batch.points[b], batch.masks[b], batch.features[b], sub, None,
                    n_points=n_points, distance_threshold=0.02, ransac_n=3,
                )
                preds.append(np.asarray(res["transform"]))
                gts.append(
                    np.concatenate(
                        [np.asarray(batch.rot[b]), np.asarray(batch.trans[b])[:, None]], 1
                    )
                )
                m0 = np.asarray(batch.masks[b][0])
                m1 = np.asarray(batch.masks[b][1])
                srcs.append(np.asarray(batch.points[b][0])[m0])
                refs.append(np.asarray(batch.points[b][1])[m1])
                # Clean full cloud threaded through the batch (reference
                # tester.py:260 'points_raw'); the model-input ref cloud is
                # NOT protocol-faithful for the modified chamfer.
                if batch.extras is None or "points_raw" not in batch.extras:
                    raise KeyError(
                        "ModelNet chamfer needs batch.extras['points_raw'] — "
                        "ensure the dataset emits it (data/modelnet.py)"
                    )
                raws.append(np.asarray(batch.extras["points_raw"][b]))
        n = min(len(p) for p in srcs)
        m = min(len(p) for p in refs)
        metrics = compute_metrics(
            np.stack([p[:n] for p in srcs]),
            np.stack([p[:m] for p in refs]),
            np.stack(raws),  # fixed-size clean clouds, no crop needed
            np.stack(gts),
            np.stack(preds),
        )
        summary = summarize_metrics(metrics)
        print(summary, flush=True)
        return summary
