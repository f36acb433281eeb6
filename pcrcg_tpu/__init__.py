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
