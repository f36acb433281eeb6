"""Bisect the KPFCNN forward: time encoder prefix / bottleneck+gnn / full
on the current backend with the assets pair."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    from pcrcg_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from bench import load_assets_pair
    from pcrcg_tpu.config import Config
    from pcrcg_tpu.data.pair import make_pair_batch
    from pcrcg_tpu.models.blocks import ResnetBottleneckBlock, SimpleBlock
    from pcrcg_tpu.models.kpfcnn import KPFCNN, plan_architecture
    from pcrcg_tpu.ops.pyramid import build_pyramid

    cfg = Config()
    src, tgt = load_assets_pair()
    batch = make_pair_batch(
        [dict(src_pcd=src, tgt_pcd=tgt, rot=np.eye(3), trans=np.zeros(3))],
        cfg.budgets.points[0],
    )
    pts, msk, feats = batch.points[0], batch.masks[0], batch.features[0]
    pyr = jax.jit(
        lambda p, m: build_pyramid(p, m, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius)
    )(pts, msk)
    jax.block_until_ready(pyr)

    plan = plan_architecture(cfg)

    class EncoderPrefix(nn.Module):
        config: Config
        n_blocks: int

        @nn.compact
        def __call__(self, pyramid, features):
            c = self.config
            kp_kwargs = dict(
                num_kernel_points=c.num_kernel_points, influence=c.KP_influence,
                aggregation=c.aggregation_mode, fixed=c.fixed_kernel_points,
            )
            ratio = c.KP_extent / c.conv_radius
            x = features
            for i, bp in enumerate(plan.encoder[: self.n_blocks]):
                lvl = bp.layer
                if bp.strided:
                    q_pts, q_mask = pyramid.points[lvl + 1], pyramid.masks[lvl + 1]
                    neighb = pyramid.pools[lvl]
                else:
                    q_pts, q_mask = pyramid.points[lvl], pyramid.masks[lvl]
                    neighb = pyramid.neighbors[lvl]
                s_pts, s_mask = pyramid.points[lvl], pyramid.masks[lvl]
                common = dict(
                    in_dim=bp.in_dim, out_dim=bp.out_dim, radius=bp.radius,
                    kp_extent=bp.radius * ratio, config_kp=kp_kwargs,
                    strided=bp.strided, kp_seed=bp.kp_seed, name=f"encoder_{i}",
                )
                if bp.kind == "simple":
                    x = SimpleBlock(**common)(x, q_pts, s_pts, neighb, q_mask)
                else:
                    x = ResnetBottleneckBlock(**common)(x, q_pts, s_pts, neighb, q_mask, s_mask)
            return x

    def readback(out):
        # Force completion: async dispatch returns immediately under the
        # axon plugin, so only a host readback gives a true wall clock.
        leaves = jax.tree_util.tree_leaves(out)
        return float(jnp.sum(leaves[0].astype(jnp.float32)))

    def timed(name, model, *args):
        variables = jax.jit(model.init)(jax.random.key(0), *args)
        readback(variables)
        f = jax.jit(model.apply)
        readback(f(variables, *args))
        ts = []
        for i in range(3):
            a = (args[0], args[1] * (1.0 + 1e-6 * (i + 1)), *args[2:])
            t0 = time.perf_counter()
            out = f(variables, *a)
            readback(out)
            ts.append((time.perf_counter() - t0) * 1000)
        print(f"{name}: " + " ".join(f"{t:.1f}" for t in ts) + " ms", flush=True)

    which = sys.argv[1:] or ["enc3", "enc11", "full"]
    if "enc3" in which:
        timed("encoder[:3] (level0)", EncoderPrefix(cfg, 3), pyr, feats)
    if "enc11" in which:
        timed("encoder[:11] (all)", EncoderPrefix(cfg, 11), pyr, feats)
    if "full" in which:
        timed("full kpfcnn", KPFCNN(cfg), pyr, feats)
