"""PCR-CG-TPU: a TPU-native point-cloud-registration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of PCR-CG
(ECCV 2022, reference: /root/reference) — point cloud registration via
explicit color and geometry — built TPU-first:

* static shapes everywhere (fixed per-level point budgets + neighbor caps),
* the whole pair pipeline (pyramid build, KPConv stack, GNN, losses,
  RANSAC pose estimation) runs on device under one jit,
* batching over pairs + data-parallel sharding over a `jax.sharding.Mesh`
  (the reference is single-GPU, batch=1).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level surface (keeps `import pcrcg_tpu` light).
    import importlib

    targets = {
        "Config": ("pcrcg_tpu.config", "Config"),
        "load_config": ("pcrcg_tpu.config", "load_config"),
        "Budgets": ("pcrcg_tpu.config", "Budgets"),
        "PCRCG": ("pcrcg_tpu.models.pcrcg", "PCRCG"),
        "KPFCNN": ("pcrcg_tpu.models.kpfcnn", "KPFCNN"),
        "PairBatch": ("pcrcg_tpu.data.pair", "PairBatch"),
        "build_pyramid": ("pcrcg_tpu.ops.pyramid", "build_pyramid"),
        "metric_loss": ("pcrcg_tpu.losses", "metric_loss"),
        "Trainer": ("pcrcg_tpu.train.trainer", "Trainer"),
        "ransac_pose": ("pcrcg_tpu.registration.ransac", "ransac_pose"),
    }
    if name in targets:
        module, attr = targets[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'pcrcg_tpu' has no attribute {name!r}")
