"""Candidate-DMA KPConv (ops/kpconv_tiled.py) vs the XLA path, driven
through the tiled search's local-index output (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcrcg_tpu.models.kpconv import kpconv
from pcrcg_tpu.ops.kpconv_tiled import kpconv_tiled, kpconv_tiled_ad
from pcrcg_tpu.ops.masked import PAD_COORD
from pcrcg_tpu.ops.subsample import morton_sort
from pcrcg_tpu.ops.tiled_search import radius_search_tiled


def _setup(rng, nq=200, ns=600, c=12, d=16, k=15, h=9, radius=0.11, tile=32, m_tiles=6):
    sup = rng.uniform(0, 1, size=(ns, 3)).astype(np.float32)
    sup_j, mask_j, _ = morton_sort(jnp.asarray(sup), jnp.ones(ns, bool))
    q = np.asarray(sup_j)[rng.permutation(ns)[:nq]]
    gidx, lidx, tiles = radius_search_tiled(
        jnp.asarray(q), sup_j, mask_j, radius, h,
        tile=tile, m_tiles=m_tiles, return_local=True,
    )
    assert tiles is not None, "cloud too small to exercise the tiled path"
    feats = rng.normal(size=(ns, c)).astype(np.float32)
    kp = rng.normal(scale=0.04, size=(k, 3)).astype(np.float32)
    w = rng.normal(size=(k, c, d)).astype(np.float32)
    return (jnp.asarray(q), sup_j, jnp.asarray(feats), gidx, lidx, tiles,
            jnp.asarray(kp), jnp.asarray(w))


def test_tiled_kernel_matches_xla(rng):
    q, sup, feats, gidx, lidx, tiles, kp, w = _setup(rng)
    extent = 0.08
    want = kpconv(q, sup, gidx, feats, kp, w, extent)
    out, nn = kpconv_tiled(
        q, sup, feats, lidx, tiles, kp, w, extent, interpret=True, tile=32,
    )
    got = out / nn[:, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_tiled_kernel_single_limb_features(rng):
    """feat_limbs=1 packs feature rows as ONE bf16 limb: same result to
    bf16 tolerance (~2^-9 relative), with coords still ~f32-exact (the
    influence weights, which gate everything, must not degrade)."""
    q, sup, feats, gidx, lidx, tiles, kp, w = _setup(rng)
    extent = 0.08
    want = kpconv(q, sup, gidx, feats, kp, w, extent)
    out, nn = kpconv_tiled(
        q, sup, feats, lidx, tiles, kp, w, extent, interpret=True, tile=32,
        feat_limbs=1,
    )
    got = np.asarray(out / nn[:, None])
    want = np.asarray(want)
    # bf16-grade agreement, elementwise relative to the row scale.
    scale = np.maximum(np.abs(want).max(axis=-1, keepdims=True), 1e-3)
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)
    # And clearly tighter than garbage: median relative error ~2^-9.
    med = np.median(np.abs(got - want) / scale)
    assert med < 5e-3, med


def test_tiled_kernel_influences_and_closest(rng):
    q, sup, feats, gidx, lidx, tiles, kp, w = _setup(rng)
    extent = 0.08
    for influence in ("gaussian", "constant"):
        want = kpconv(q, sup, gidx, feats, kp, w, extent, influence)
        out, nn = kpconv_tiled(
            q, sup, feats, lidx, tiles, kp, w, extent, influence,
            interpret=True, tile=32,
        )
        np.testing.assert_allclose(
            np.asarray(out / nn[:, None]), np.asarray(want), rtol=2e-4, atol=2e-4
        )
    want = kpconv(q, sup, gidx, feats, kp, w, extent, "linear", "closest")
    out, nn = kpconv_tiled(
        q, sup, feats, lidx, tiles, kp, w, extent, "linear", "closest",
        interpret=True, tile=32,
    )
    np.testing.assert_allclose(
        np.asarray(out / nn[:, None]), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_tiled_kernel_gradients_match_xla(rng):
    q, sup, feats, gidx, lidx, tiles, kp, w = _setup(rng)
    extent = 0.08
    cot = jnp.asarray(np.random.default_rng(0).normal(size=(q.shape[0], w.shape[2])).astype(np.float32))

    def loss_ref(f_, w_):
        out = kpconv(q, sup, gidx, f_, kp, w_, extent)
        return jnp.sum(out * cot)

    def loss_tiled(f_, w_):
        out, nn = kpconv_tiled_ad(
            q, sup, f_, lidx, tiles, gidx, kp, w_, extent, interpret=True,
            tile=32,
        )
        return jnp.sum(out / nn[:, None] * cot)

    # NB: kpconv_tiled_ad returns out BEFORE the nn division like
    # kpconv_tiled; nn is constant (comparison-based count).
    df_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    df_got, dw_got = jax.grad(loss_tiled, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(df_got), np.asarray(df_ref), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref), rtol=1e-3, atol=1e-4)


def test_tiled_kernel_wide_channels(rng):
    """c_tiles > 1 and d_tiles > 1 (the L2/L3 block widths): forward and
    gradients still match the XLA path through the channel-blocked grid."""
    q, sup, feats, gidx, lidx, tiles, kp, w = _setup(rng, c=200, d=300)
    extent = 0.08
    want = kpconv(q, sup, gidx, feats, kp, w, extent)
    out, nn = kpconv_tiled(
        q, sup, feats, lidx, tiles, kp, w, extent, interpret=True, tile=32,
    )
    got = out / nn[:, None]

    # The bf16 hi/lo limb error is relative to the CONTRACTION SCALE, not
    # the (possibly cancelled) output entry: ~1e-5 of max|out| per array
    # (measured 5e-6 fwd / 1.5e-5 grads at these shapes).
    def assert_close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-4 * max(np.abs(b).max(), 1.0)
        )

    assert_close(got, want)

    cot = jnp.asarray(
        np.random.default_rng(2).normal(size=(q.shape[0], w.shape[2])).astype(np.float32)
    )

    def loss_ref(f_, w_):
        out_ = kpconv(q, sup, gidx, f_, kp, w_, extent)
        return jnp.sum(out_ * cot)

    def loss_tiled(f_, w_):
        out_, nn_ = kpconv_tiled_ad(
            q, sup, f_, lidx, tiles, gidx, kp, w_, extent, interpret=True,
            tile=32,
        )
        return jnp.sum(out_ / nn_[:, None] * cot)

    df_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    df_got, dw_got = jax.grad(loss_tiled, argnums=(0, 1))(feats, w)
    assert_close(df_got, df_ref)
    assert_close(dw_got, dw_ref)


def test_tiled_kernel_midwide_channels(rng):
    """c_in in (128, _C_SINGLE_MAX] — the images-path first conv (C=129,
    reference architectures.py:360-370 repeat(1,129)) — runs as a SINGLE
    channel block (c8=136, c_tiles=1).  Forward and gradients must match
    the XLA path; the gradient check also covers _scatter_ds_feats at a
    non-multiple-of-128 c8 (which 128-blocking would silently truncate)."""
    q, sup, feats, gidx, lidx, tiles, kp, w = _setup(rng, c=129, d=64)
    extent = 0.08
    want = kpconv(q, sup, gidx, feats, kp, w, extent)
    out, nn = kpconv_tiled(
        q, sup, feats, lidx, tiles, kp, w, extent, interpret=True, tile=32,
    )
    got = out / nn[:, None]

    def assert_close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-4 * max(np.abs(b).max(), 1.0)
        )

    assert_close(got, want)

    cot = jnp.asarray(
        np.random.default_rng(3).normal(size=(q.shape[0], w.shape[2])).astype(np.float32)
    )

    def loss_ref(f_, w_):
        out_ = kpconv(q, sup, gidx, f_, kp, w_, extent)
        return jnp.sum(out_ * cot)

    def loss_tiled(f_, w_):
        out_, nn_ = kpconv_tiled_ad(
            q, sup, f_, lidx, tiles, gidx, kp, w_, extent, interpret=True,
            tile=32,
        )
        return jnp.sum(out_ / nn_[:, None] * cot)

    df_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    df_got, dw_got = jax.grad(loss_tiled, argnums=(0, 1))(feats, w)
    assert_close(df_got, df_ref)
    assert_close(dw_got, dw_ref)
    # The channels past 128 must carry real gradient (the blocked-scatter
    # truncation bug would zero them).
    assert np.abs(np.asarray(df_got)[:, 128:]).max() > 0

    # Single-limb variant (the bench/production default) at the same width.
    out1, nn1 = kpconv_tiled(
        q, sup, feats, lidx, tiles, kp, w, extent, interpret=True, tile=32,
        feat_limbs=1,
    )
    got1 = np.asarray(out1 / nn1[:, None])
    want_np = np.asarray(want)
    scale = np.maximum(np.abs(want_np).max(axis=-1, keepdims=True), 1e-3)
    np.testing.assert_allclose(got1 / scale, want_np / scale, atol=2e-2)


def test_tiled_kernel_stacked_clouds(rng):
    """Stacking B clouds into one point set with per-cloud tile offsets
    (the one-dispatch batching in models/kpconv.py and blocks.py) matches
    the per-cloud calls exactly."""
    from pcrcg_tpu.models.blocks import max_pool
    from pcrcg_tpu.ops.kpconv_tiled import max_pool_tiled

    tile = 32
    per = []
    for seed in (5, 6):
        per.append(_setup(np.random.default_rng(seed), nq=128, ns=608))
    kp, w = per[0][6], per[0][7]
    extent = 0.08
    nq, ns = 128, per[0][1].shape[0]
    n_per = ns // tile
    assert ns % tile == 0 and nq % 128 == 0

    q_st = jnp.concatenate([p[0] for p in per])
    s_st = jnp.concatenate([p[1] for p in per])
    f_st = jnp.concatenate([p[2] for p in per])
    lidx_st = jnp.concatenate([p[4] for p in per])
    tiles_st = jnp.concatenate([p[5] + b * n_per for b, p in enumerate(per)])
    out_st, nn_st = kpconv_tiled(
        q_st, s_st, f_st, lidx_st, tiles_st, kp, w, extent,
        interpret=True, tile=tile,
    )
    got = np.asarray(out_st / nn_st[:, None])
    for b, p in enumerate(per):
        q, sup, feats, gidx, lidx, tiles = p[:6]
        out_b, nn_b = kpconv_tiled(
            q, sup, feats, lidx, tiles, kp, w, extent, interpret=True, tile=tile,
        )
        want = np.asarray(out_b / nn_b[:, None])
        np.testing.assert_allclose(got[b * nq : (b + 1) * nq], want, rtol=1e-6, atol=1e-6)

    # Stacked shortcut max-pool: global indices offset per cloud, shadow
    # mapped past the stacked array (pad_gather fills zero).
    ioff = jnp.arange(2, dtype=jnp.int32)[:, None, None] * ns
    gidx_all = jnp.stack([p[3] for p in per])
    inds_st = jnp.where(gidx_all >= ns, 2 * ns, gidx_all + ioff).reshape(2 * nq, -1)
    mp_st = max_pool_tiled(f_st, inds_st, lidx_st, tiles_st, tile=tile, interpret=True)
    for b, p in enumerate(per):
        want_mp = max_pool(p[2][None], p[3][None])[0]
        np.testing.assert_allclose(
            np.asarray(mp_st[b * nq : (b + 1) * nq]), np.asarray(want_mp),
            rtol=1e-6, atol=1e-6,
        )


def test_max_pool_tiled_matches_xla(rng):
    from pcrcg_tpu.models.blocks import max_pool
    from pcrcg_tpu.ops.kpconv_tiled import max_pool_tiled

    q, sup, feats, gidx, lidx, tiles, kp, w = _setup(rng)
    want = max_pool(feats[None], gidx[None])[0]
    got = max_pool_tiled(feats, gidx, lidx, tiles, tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    cot = jnp.asarray(
        np.random.default_rng(1).normal(size=want.shape).astype(np.float32)
    )

    def loss_ref(f_):
        return jnp.sum(max_pool(f_[None], gidx[None])[0] * cot)

    def loss_tiled(f_):
        return jnp.sum(max_pool_tiled(f_, gidx, lidx, tiles, tile=32, interpret=True) * cot)

    df_ref = jax.grad(loss_ref)(feats)
    df_got = jax.grad(loss_tiled)(feats)
    # The tiled backward uses a first-winner subgradient; XLA's eq-split
    # only differs on exact value ties, which random features don't hit.
    # Tolerance matches the conv-grad test: the bf16 hi/lo limb path is
    # exact to ~2^-16 relative per contribution.
    np.testing.assert_allclose(np.asarray(df_got), np.asarray(df_ref), rtol=1e-3, atol=1e-4)


def test_tiled_kernel_wide_c_single_d(rng):
    """c_tiles = 2 with d_tiles = 1 (the C=256 -> D<=256 decoder-side
    convs): after the (g, jc, jd) grid reorder the cross-jc accumulation
    runs through the scratch accumulator even when each out block is
    visited once per jc consecutively — forward must still match XLA."""
    q, sup, feats, gidx, lidx, tiles, kp, w = _setup(rng, c=200, d=100)
    extent = 0.08
    want = kpconv(q, sup, gidx, feats, kp, w, extent)
    out, nn = kpconv_tiled(
        q, sup, feats, lidx, tiles, kp, w, extent, interpret=True, tile=32,
    )
    got = out / nn[:, None]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want),
        rtol=1e-3, atol=1e-4 * max(float(np.abs(np.asarray(want)).max()), 1.0),
    )
