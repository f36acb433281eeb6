"""Train state + optimizer factory.

Capability parity with the reference runtime: SGD(momentum .98, wd 1e-6) or
Adam, exponential per-epoch LR decay γ=.95 (main.py:59-78), NaN/Inf
gradient gate that skips the optimizer step (lib/trainer.py:361-367,
lib/utils.py:100-110 — here via optax.apply_if_finite), gradient
accumulation via iter_size (trainer.py:361 — optax.MultiSteps).
"""
from __future__ import annotations

from typing import Any

import jax
import optax
from flax.struct import dataclass as pytree, field

from pcrcg_tpu.config import Config


@pytree
class TrainState:
    params: Any
    constants: Any  # fixed kernel dispositions etc. (never updated)
    opt_state: Any
    step: jax.Array
    tx: optax.GradientTransformation = field(pytree_node=False)
    # Non-trainable collections (e.g. the frozen 2D backbone's batch_stats).
    batch_stats: Any = None

    def variables(self):
        out = {"params": self.params, "constants": self.constants}
        if self.batch_stats is not None:
            out["batch_stats"] = self.batch_stats
        return out

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(params=new_params, opt_state=new_opt_state, step=self.step + 1)

    def replace(self, **kw) -> "TrainState":
        import dataclasses

        return dataclasses.replace(self, **kw)


def trainable_labels(params):
    """Pytree of {'train','frozen'} labels: 'frozen' under ``backbone2d``.
    The reference builds the frozen 2D backbone OUTSIDE the optimizer
    (main.py:59 optimizes only the KPFCNN; lib/trainer.py:49-70), so weight
    decay / momentum must never see it.  Its lifted features are detached, so
    its grads are identically zero — but ``optax.add_decayed_weights`` is
    gradient-independent and would still decay it every step without this."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    labels = {
        k: "frozen" if any("backbone2d" in str(part) for part in k) else "train"
        for k in flat
    }
    return unflatten_dict(labels)


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=max(steps_per_epoch * cfg.scheduler_freq, 1),
        decay_rate=cfg.scheduler_gamma,
        staircase=True,  # the reference steps ExponentialLR once per epoch
    )
    if cfg.optimizer.upper() == "SGD":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(learning_rate=schedule, momentum=cfg.momentum),
        )
    elif cfg.optimizer.upper() == "ADAM":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(learning_rate=schedule),
        )
    else:
        raise ValueError(f"Unknown optimizer: {cfg.optimizer}")
    # Frozen-2D-backbone exclusion (reference main.py:59): frozen leaves get
    # hard-zero updates — no decay, no momentum state.
    tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, trainable_labels)
    if cfg.iter_size > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.iter_size).gradient_transformation()
    # Skip (don't crash on) non-finite grads, like validate_gradient.
    return optax.apply_if_finite(tx, max_consecutive_errors=10**8)


def create_train_state(cfg: Config, variables, steps_per_epoch: int = 1) -> TrainState:
    tx = make_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    return TrainState(
        params=params,
        constants=variables.get("constants", {}),
        opt_state=tx.init(params),
        step=jax.numpy.zeros((), jax.numpy.int32),
        tx=tx,
        batch_stats=variables.get("batch_stats"),
    )
