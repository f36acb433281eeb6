"""Training/eval orchestration.

Capability parity with reference lib/trainer.py:31-431: epoch loop over a
prefetching loader, stats meters, verbose_freq scalar logging, per-epoch
snapshots plus best-loss / best-recall snapshots, resume from
``config.pretrain``, 2D-backbone weight ingestion per init_mode
(trainer.py:49-70), and the actual (unweighted) loss summation — which
lives in pcrcg_tpu.losses.metric_loss.

TPU-native differences: the device step is ONE compiled program
(pyramid+forward+loss+update, train/step.py); the loader only pads; NaN
gradients are skipped inside the step (optax.apply_if_finite) instead of a
host-side validate_gradient pass.
"""
from __future__ import annotations

import os
from collections import defaultdict, deque
from typing import Dict, Optional

import jax
import numpy as np

from pcrcg_tpu.config import Config
from pcrcg_tpu.data.loader import PairLoader
from pcrcg_tpu.models.pcrcg import PCRCG
from pcrcg_tpu.ops.pyramid import build_pyramid_cfg
from pcrcg_tpu.train.checkpoints import CheckpointManager
from pcrcg_tpu.train.state import TrainState, create_train_state
from pcrcg_tpu.train.step import (
    eval_step,
    eval_step_dp,
    infer_step,
    train_step,
    train_step_dp,
)
from pcrcg_tpu.utils.logging import Logger
from pcrcg_tpu.utils.timer import RunningStat, Stopwatch


def _example_images(cfg: Config):
    """Zero image stack for model init when image_feature is on."""
    i = cfg.img_num
    return {
        "colors": np.zeros((2, i, 240, 320, 3), np.float32),
        "depths": np.zeros((2, i, 120, 160), np.float32),
        "world2cam": np.tile(np.eye(4, dtype=np.float32), (2, i, 1, 1)),
        "valid_maps": np.zeros((2, i, 120, 160), np.float32),
        "intrinsics": np.eye(4, dtype=np.float32),
    }


def init_model(cfg: Config, seed: Optional[int] = None):
    """Build PCRCG + init variables (and import 2D weights per init_mode)."""
    model = PCRCG(cfg)
    n0 = cfg.budgets.points[0]
    from pcrcg_tpu.ops.masked import PAD_COORD

    pts = np.full((2, n0, 3), PAD_COORD, np.float32)
    rngp = np.random.default_rng(0)
    pts[:, :64] = rngp.uniform(0, 1, size=(2, 64, 3))
    msk = np.zeros((2, n0), bool)
    msk[:, :64] = True
    pyr = build_pyramid_cfg(cfg, jax.numpy.asarray(pts), jax.numpy.asarray(msk))
    feats = np.where(msk[..., None], 1.0, 0.0).astype(np.float32)
    feats = np.tile(feats, (1, 1, cfg.in_feats_dim))
    args = (pyr, jax.numpy.asarray(feats))
    if cfg.image_feature:
        args = args + (jax.tree_util.tree_map(jax.numpy.asarray, _example_images(cfg)),)
    # jitted init: eager flax init dispatches thousands of tiny ops, which
    # costs minutes over the axon tunnel.
    variables = jax.jit(model.init)(
        jax.random.key(seed if seed is not None else cfg.seed), *args
    )

    # 2D backbone init modes (reference trainer.py:49-70): torch checkpoints
    # for pri3d/3dmatch/image_net when a path is configured; random otherwise.
    if cfg.image_feature and cfg.init_mode != "random" and cfg.pretrain_2d_path():
        import flax

        variables = flax.core.unfreeze(variables)
        from pcrcg_tpu.models.torch_import import load_backbone2d

        sub = {
            "params": variables["params"]["lift"]["backbone2d"],
            "batch_stats": variables["batch_stats"]["lift"]["backbone2d"],
        }
        merged, report = load_backbone2d(cfg.pretrain_2d_path(), sub)
        variables["params"]["lift"]["backbone2d"] = merged["params"]
        variables["batch_stats"]["lift"]["backbone2d"] = merged["batch_stats"]
    return model, variables


class Trainer:
    def __init__(self, cfg: Config, datasets: Dict[str, object]):
        self.cfg = cfg
        self.logger = Logger(cfg.exp_dir)
        self.logger.dump_config(cfg)
        self._backup_source(cfg.exp_dir)
        def make_loader(phase, ds):
            # Eval phases must not drop tail pairs (protocol completeness,
            # reference lib/benchmark.py:271-337 scores every split pair);
            # train keeps drop-last for static shapes.  A ragged eval
            # split falls back to batch_size=1 (which always divides).
            bsz = cfg.batch_size
            if phase != "train" and len(ds) % bsz != 0:
                self.logger.write(
                    f"{phase} split ({len(ds)} pairs) not divisible by "
                    f"batch_size={bsz}; eval loader falls back to "
                    "batch_size=1 for completeness\n"
                )
                bsz = 1
            return PairLoader(
                ds,
                cfg.budgets.points[0],
                batch_size=bsz,
                shuffle=phase == "train",
                num_threads=cfg.num_workers,
                seed=cfg.seed,
                drop_last=phase == "train",
            )

        self.loaders = {
            phase: make_loader(phase, ds) for phase, ds in datasets.items()
        }
        self._check_budgets(datasets)
        self.model, variables = init_model(cfg)
        steps = max(len(self.loaders.get("train", [])), 1)
        self.state: TrainState = create_train_state(cfg, variables, steps_per_epoch=steps)
        # Multi-chip data parallelism (new capability — the reference is
        # single-GPU batch=1, SURVEY.md §2.3): pairs shard over the mesh
        # 'data' axis, the train state replicates, and XLA inserts the
        # gradient all-reduce over ICI inside the jitted step.
        self.mesh = None
        self.multihost = jax.process_count() > 1
        if cfg.data_parallel > 1 or self.multihost:
            from pcrcg_tpu.parallel.mesh import make_mesh, replicate

            if self.multihost:
                # Multi-host: the mesh spans every chip of every process;
                # each host loads only its slice of the global batch
                # (parallel/multihost.py), DCN carries only the gradient
                # all-reduce.
                from pcrcg_tpu.parallel.multihost import global_data_mesh

                self.mesh = global_data_mesh()
            else:
                n_dev = len(jax.devices())
                if cfg.data_parallel > n_dev:
                    raise ValueError(
                        f"data_parallel={cfg.data_parallel} but only {n_dev} devices"
                    )
                self.mesh = make_mesh(n_data=cfg.data_parallel)
            n_shards = self.mesh.devices.size if self.multihost else cfg.data_parallel
            if cfg.batch_size % n_shards != 0:
                raise ValueError(
                    f"batch_size={cfg.batch_size} must be a multiple of "
                    f"the data-parallel shard count {n_shards}"
                )
            self.state = replicate(self.state, self.mesh)
            # Pure data parallelism (no cloud/'model' axis) runs through
            # shard_map (train_step_dp): each device executes the plain
            # per-pair lax.map body, so the scalar-prefetch Pallas kernels
            # stay usable.  Only the GSPMD-vmap path (cloud axis active)
            # cannot batch them.
            self.use_shard_map = (
                self.multihost or self.mesh.shape.get("model", 1) == 1
            )
            if (
                not self.use_shard_map
                and jax.default_backend() == "tpu"
                and (self.cfg.kpconv_tiled or self.cfg.budgets.search_kernel)
            ):
                import dataclasses

                self.cfg = self.cfg.replace(
                    kpconv_tiled=False,
                    budgets=dataclasses.replace(
                        self.cfg.budgets, search_kernel=False
                    ),
                )
        self.ckpt = CheckpointManager(os.path.join(cfg.exp_dir, "checkpoints"))
        self.start_epoch = 0
        if cfg.pretrain and cfg.pretrain.endswith((".pth", ".pt", ".tar")):
            # Reference-format torch checkpoint (lib/trainer.py:163-184
            # _load_pretrain): import trained weights + the checkpoint's
            # kernel dispositions directly into the flax variables.
            from pcrcg_tpu.models.torch_import import load_kpfcnn

            new_vars, report = load_kpfcnn(
                cfg.pretrain,
                {"params": self.state.params, "constants": self.state.constants},
                strict=False,
            )
            if self.mesh is not None:
                # The import splices host numpy arrays into a replicated
                # state — re-replicate so every leaf is a mesh-sharded
                # global array again (multihost jit rejects host-local).
                from pcrcg_tpu.parallel.mesh import replicate

                new_vars = replicate(new_vars, self.mesh)
            self.state = self.state.replace(
                params=new_vars["params"], constants=new_vars["constants"]
            )
            self.logger.write(
                f"imported torch pretrain from {cfg.pretrain}: {report['loaded']} "
                f"tensors ({len(report['errors'])} unmatched)\n"
            )
        elif cfg.pretrain:
            self.state, meta = self.ckpt.restore(self.state, path=cfg.pretrain)
            self.start_epoch = int(meta["epoch"]) + 1
            self.logger.write(f"restored pretrain from {cfg.pretrain} @epoch {meta['epoch']}\n")
        self.key = jax.random.key(cfg.seed)

    def _check_budgets(self, datasets, num_samples: int = 4):
        """Fail loudly (in the log) when the configured static budgets drop
        points: level-0 truncation is now random-uniform (data/pair.py) but
        any truncation still loses signal, and a voxel-budget overflow at
        level ℓ>0 silently corrupts every downstream level (ops/subsample.py
        OOB-scatter drop).  Samples a few training clouds through the native
        golden pyramid to check occupancy vs budgets."""
        ds = datasets.get("train") or next(iter(datasets.values()), None)
        if ds is None or len(ds) == 0:
            return
        try:
            from pcrcg_tpu.data.calibrate import occupancy_report

            report = occupancy_report(ds, self.cfg, num_samples=num_samples)
        except Exception as e:  # native toolchain unavailable, odd dataset, ...
            self.logger.write(f"budget occupancy check skipped: {e}\n")
            return
        self.logger.write(f"budget occupancy: {report}\n")
        if any(report["truncating"]):
            msg = (
                "WARNING: static point budgets TRUNCATE at levels "
                f"{[i for i, t in enumerate(report['truncating']) if t]} "
                f"(max occupancy {report['max']} vs budgets {report['budget']}); "
                "raise tpu.budgets.points or run scripts/calibrate_budgets.py"
            )
            self.logger.write(msg + "\n")
            print(msg, flush=True)

    def _check_overflow(self, stats: dict, phase: str, epoch: int, c_iter: int):
        """Per-step voxel-budget overflow action (cfg.overflow_action):
        stats['max_overflow'] > 0 means the pyramid dropped voxels past a
        level budget this step — the silent-corruption mode VERDICT r4
        flagged (ops/subsample.py OOB-scatter drop)."""
        ov = stats.get("max_overflow", 0.0)
        if ov <= 0 or self.cfg.overflow_action == "none":
            return
        msg = (
            f"{phase} Epoch {epoch} iter {c_iter}: voxel-budget OVERFLOW "
            f"(max_overflow={ov:.0f} voxels dropped past a level budget); "
            "raise tpu.budgets.points or run scripts/calibrate_budgets.py"
        )
        if self.cfg.overflow_action == "error":
            raise RuntimeError(msg)
        self.logger.write(msg + "\n")
        print(msg, flush=True)

    @staticmethod
    def _backup_source(exp_dir: str):
        """Copy the package source into the snapshot dir (reference
        main.py:46-51 reproducibility convention)."""
        import shutil

        src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(exp_dir, "source_backup", "pcrcg_tpu")
        if not os.path.exists(dst):
            shutil.copytree(
                src, dst, ignore=shutil.ignore_patterns("__pycache__", "*.pyc")
            )

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def run_epoch(self, epoch: int, phase: str) -> Dict[str, RunningStat]:
        assert phase in ("train", "val", "test")
        meters: Dict[str, RunningStat] = defaultdict(RunningStat)
        loader = self.loaders[phase]
        num_iter = len(loader)
        timer = Stopwatch()
        inflight: deque = deque()
        for c_iter, (batch, images) in enumerate(loader):
            timer.tic()
            if self.mesh is not None and self.multihost:
                from pcrcg_tpu.parallel.multihost import global_pair_batch

                g = batch.batch_size * jax.process_count()
                batch = global_pair_batch(batch, self.mesh, g)
                images = global_pair_batch(images, self.mesh, g) if images else None
            elif self.mesh is not None:
                from pcrcg_tpu.parallel.mesh import shard_images, shard_pair_batch

                images = shard_images(images, self.mesh, batch.batch_size)
                batch = shard_pair_batch(batch, self.mesh)
            sharded = self.mesh is not None
            use_dp = sharded and getattr(self, "use_shard_map", False)
            if phase == "train":
                if use_dp:
                    self.state, stats = train_step_dp(
                        self.model, self.cfg, self.state, batch,
                        self._next_key(), self.mesh, images,
                    )
                else:
                    self.state, stats = train_step(
                        self.model, self.cfg, self.state, batch, self._next_key(),
                        images, sharded=sharded,
                    )
            elif use_dp:
                stats = eval_step_dp(
                    self.model, self.cfg, self.state, batch, self._next_key(),
                    self.mesh, images,
                )
            else:
                stats = eval_step(
                    self.model, self.cfg, self.state, batch, self._next_key(), images,
                    sharded=sharded,
                )
            # Pipelined metering: realize step i-2's stats while step i
            # computes — a blocking float() per step costs the full ~28 ms
            # dispatch+readback RTT on the tunnel runtime (PERF.md), which
            # is most of the gap between 177 ms device and 205 ms wall.
            inflight.append((stats, batch.batch_size))
            if len(inflight) > 2:
                stats, bsz = inflight.popleft()
                stats = {k: float(v) for k, v in stats.items()}
                for k, v in stats.items():
                    meters[k].update(v)
                self._check_overflow(stats, phase, epoch, c_iter)
            timer.toc()
            meters["pairs_per_sec"].update(batch.batch_size / max(timer.elapsed, 1e-9))
            if (c_iter + 1) % self.cfg.verbose_freq == 0 and self.cfg.verbose:
                step = num_iter * epoch + c_iter
                self.logger.scalars(phase, {k: m.mean for k, m in meters.items()}, step)
                msg = f"{phase} Epoch: {epoch} [{c_iter+1:4d}/{num_iter}] " + " ".join(
                    f"{k}: {m.mean:.3f}" for k, m in meters.items()
                )
                self.logger.write(msg + "\n")
                print(msg, flush=True)
        for stats, bsz in inflight:  # drain the pipelined tail
            stats = {k: float(v) for k, v in stats.items()}
            for k, v in stats.items():
                meters[k].update(v)
            self._check_overflow(stats, phase, epoch, num_iter - 1)
        summary = f"{phase} Epoch {epoch}: " + " ".join(
            f"{k}: {m.mean:.3f}" for k, m in meters.items()
        )
        self.logger.write(summary + "\n")
        print(summary, flush=True)
        return meters

    def train(self):
        for epoch in range(self.start_epoch, self.cfg.max_epoch):
            self.run_epoch(epoch, "train")
            meters = self.run_epoch(epoch, "val")
            self.ckpt.maybe_save_best(
                self.state, epoch, meters["circle_loss"].mean, meters["recall"].mean
            )
            if (epoch + 1) % self.cfg.snapshot_freq == 0:
                self.ckpt.save(self.state, epoch)
        print("Training finish!", flush=True)

    def eval(self):
        return self.run_epoch(0, "val")

    def infer(self, batch, images=None):
        return infer_step(self.model, self.cfg, self.state, batch, images)
