"""Direct numerical parity against the REFERENCE torch implementation
(loaded from /root/reference): circle loss, FMR recall, weighted BCE and
the KPConv forward must agree on identical inputs.

These tests import the reference's own modules as the oracle — the
strongest fidelity evidence available without trained checkpoints."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")

import jax
import jax.numpy as jnp

from pcrcg_tpu.config import tiny_test_config
from pcrcg_tpu.losses import circle_loss_and_recall, weighted_bce


def _ref_metric_loss():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from lib.loss import MetricLoss  # noqa: the reference module

    class Cfg:
        image_feature = False
        node_overlap = False
        quaternion = False
        pos_margin = 0.1
        neg_margin = 1.4
        max_points = 256
        safe_radius = 0.1
        matchability_radius = 0.05
        pos_radius = 0.0375

    return MetricLoss(Cfg())  # positional: log_scale stays 16 (main.py:100)


def test_circle_loss_and_recall_match_reference(rng):
    ref = _ref_metric_loss()
    cfg = tiny_test_config()  # same loss constants as Cfg above
    p = 48
    coords = rng.uniform(0, 0.3, size=(p, p)).astype(np.float32)
    np.fill_diagonal(coords, 0.01)
    feats = rng.uniform(0, 1.4, size=(p, p)).astype(np.float32)

    want_circle = float(ref.get_circle_loss(torch.from_numpy(coords), torch.from_numpy(feats)))
    want_recall = float(ref.get_recall(torch.from_numpy(coords), torch.from_numpy(feats)))
    got_circle, got_recall = circle_loss_and_recall(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones(p, bool), cfg
    )
    np.testing.assert_allclose(float(got_circle), want_circle, rtol=1e-5)
    np.testing.assert_allclose(float(got_recall), want_recall, rtol=1e-6)


def test_weighted_bce_matches_reference(rng):
    ref = _ref_metric_loss()
    pred = rng.uniform(0.02, 0.98, size=64).astype(np.float32)
    gt = (rng.uniform(size=64) > 0.6).astype(np.float32)
    want, want_prec, want_rec = ref.get_weighted_bce_loss(
        torch.from_numpy(pred), torch.from_numpy(gt)
    )
    got, got_prec, got_rec = weighted_bce(
        jnp.asarray(pred), jnp.asarray(gt), jnp.ones(64, bool)
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(got_prec), float(want_prec), rtol=1e-6)
    np.testing.assert_allclose(float(got_rec), float(want_rec), rtol=1e-6)


def test_kpconv_matches_reference_torch(rng):
    """Our kpconv vs the reference KPConv module with copied weights and
    kernel points."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)  # reference load_kernels reads kernels/dispositions relatively
    try:
        from models.blocks import KPConv as RefKPConv

        ref_conv = RefKPConv(
            kernel_size=15, p_dim=3, in_channels=5, out_channels=7,
            KP_extent=1.1, radius=1.4,
        )
    finally:
        os.chdir(cwd)
    nq, ns, h = 21, 33, 9
    q = rng.normal(size=(nq, 3)).astype(np.float32)
    s = rng.normal(size=(ns, 3)).astype(np.float32)
    neighb = rng.integers(0, ns + 1, size=(nq, h)).astype(np.int64)
    x = rng.normal(size=(ns, 5)).astype(np.float32)

    with torch.no_grad():
        want = ref_conv(
            torch.from_numpy(q), torch.from_numpy(s),
            torch.from_numpy(neighb), torch.from_numpy(x),
        ).numpy()

    from pcrcg_tpu.models.kpconv import kpconv

    got = np.asarray(
        kpconv(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(neighb.astype(np.int32)),
            jnp.asarray(x),
            jnp.asarray(ref_conv.kernel_points.detach().numpy()),
            jnp.asarray(ref_conv.weights.detach().numpy()),
            1.1, "linear", "sum",
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_instance_norm_matches_reference_batchnormblock(rng):
    """masked_instance_norm over the joint stack == reference BatchNormBlock
    (which is torch InstanceNorm1d, blocks.py:433-470)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.blocks import BatchNormBlock

    from pcrcg_tpu.ops.masked import masked_instance_norm

    n, c = 37, 12
    x = rng.normal(size=(n, c)).astype(np.float32)
    blk = BatchNormBlock(c, use_bn=True, bn_momentum=0.02)
    with torch.no_grad():
        want = blk(torch.from_numpy(x)).numpy()
    # ours is [B=2, N, C] masked; emulate the single joint stack.
    got = np.asarray(
        masked_instance_norm(jnp.asarray(x)[None], jnp.ones((1, n), bool), axis=(0, 1))
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gcn_self_attention_matches_reference(rng):
    """Our SelfAttention vs the reference DGCNN edge-conv with copied
    weights (reference gcn.py:96-134)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.gcn import SelfAttention as RefSelf

    import jax
    from pcrcg_tpu.models.gcn import SelfAttention

    dim, k, n = 16, 4, 30
    ref = RefSelf(dim, k=k)
    coords = rng.normal(size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, dim)).astype(np.float32)
    with torch.no_grad():
        want = (
            ref(
                torch.from_numpy(coords.T)[None],
                torch.from_numpy(feats.T)[None],
            )[0]
            .numpy()
            .T
        )

    ours = SelfAttention(dim, k, query_chunk=32)
    variables = ours.init(
        jax.random.key(0), jnp.asarray(coords), jnp.asarray(feats), jnp.ones(n, bool)
    )

    def conv_w(mod):  # torch Conv2d [out,in,1,1] -> flax Dense [in,out]
        return mod.weight.detach().numpy()[:, :, 0, 0].T

    params = {
        "conv1": {"kernel": conv_w(ref.conv1)},
        "conv2": {"kernel": conv_w(ref.conv2)},
        "conv3": {"kernel": conv_w(ref.conv3)},
    }
    got = np.asarray(
        ours.apply(
            {"params": params}, jnp.asarray(coords), jnp.asarray(feats), jnp.ones(n, bool)
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_gcn_cross_attention_matches_reference(rng):
    """AttentionalPropagation vs reference (gcn.py:139-186) with copied
    projection/merge/MLP weights."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.gcn import AttentionalPropagation as RefAP

    import jax
    from pcrcg_tpu.models.gcn import AttentionalPropagation

    dim, heads, n, m = 16, 4, 14, 11
    ref = RefAP(dim, heads)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    src = rng.normal(size=(m, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.T)[None], torch.from_numpy(src.T)[None])[0].numpy().T

    ours = AttentionalPropagation(dim, heads)
    jx, jsrc = jnp.asarray(x), jnp.asarray(src)
    masks = (jnp.ones(n, bool), jnp.ones(m, bool))
    ours.init(jax.random.key(0), jx, jsrc, *masks)

    def conv1d(mod):  # torch Conv1d [out,in,1] -> {kernel [in,out], bias}
        return {
            "kernel": mod.weight.detach().numpy()[:, :, 0].T,
            "bias": mod.bias.detach().numpy(),
        }

    params = {
        "attn": {
            "proj_q": conv1d(ref.attn.proj[0]),
            "proj_k": conv1d(ref.attn.proj[1]),
            "proj_v": conv1d(ref.attn.proj[2]),
            "merge": conv1d(ref.attn.merge),
        },
        # reference MLP = [Conv1d, InstanceNorm1d, ReLU, Conv1d]
        "mlp1": conv1d(ref.mlp[0]),
        "mlp2": conv1d(ref.mlp[3]),
    }
    got = np.asarray(ours.apply({"params": params}, jx, jsrc, *masks))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_resunet_matches_reference_via_importer(rng):
    """Reference Res18UNet (random torch init) -> our torch_import -> flax
    ResUNet must produce the same feature map; validates BOTH the
    architecture transcription and the checkpoint importer.

    Two modes: (a) the DEFAULT compares against the torch module in TRAIN
    mode — how the reference actually runs backbone2d (lib/trainer.py:49-70
    never calls .eval(); BN normalizes each image by its own batch stats);
    (b) bn_running_average=True compares against torch .eval()."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.resunet import Res18UNet

    import jax
    from pcrcg_tpu.models.resunet import ResUNet
    from pcrcg_tpu.models.torch_import import import_torch_resunet

    ref = Res18UNet(output_channel=8, pretrained=False)
    x = rng.uniform(size=(1, 3, 48, 64)).astype(np.float32)
    # Give the running stats non-default values so eval mode is a real test.
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    with torch.no_grad():
        want_train = ref.train()(torch.from_numpy(x)).numpy()[0].transpose(1, 2, 0)
    # (train-mode forward updates torch running stats; reload the snapshot)
    ref.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in state.items()})
    with torch.no_grad():
        want_eval = ref.eval()(torch.from_numpy(x)).numpy()[0].transpose(1, 2, 0)

    for running, want in ((False, want_train), (True, want_eval)):
        ours = ResUNet(output_channel=8, depth=18, bn_running_average=running)
        variables = ours.init(jax.random.key(0), jnp.zeros((1, 48, 64, 3)))
        merged, report = import_torch_resunet(state, variables)
        real_skips = [k for k in report["skipped_keys"] if "num_batches_tracked" not in k]
        assert not real_skips, real_skips
        got = np.asarray(
            ours.apply(
                jax.tree_util.tree_map(jnp.asarray, merged),
                jnp.asarray(x.transpose(0, 2, 3, 1)),
            )
        )[0]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("modulated", [False, True])
def test_deformable_kpconv_matches_reference_torch(rng, modulated):
    """Our deformable path (offset sub-conv -> offsets/modulations ->
    deformed-KP conv with in-range pruning semantics) vs the reference
    KPConv(deformable=True) with copied weights (models/blocks.py:235-372)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        from models.blocks import KPConv as RefKPConv

        ref_conv = RefKPConv(
            kernel_size=15, p_dim=3, in_channels=5, out_channels=7,
            KP_extent=1.1, radius=1.4, deformable=True, modulated=modulated,
        )
        # Non-zero offsets need non-zero offset weights (default init zeros
        # the bias only; weights are kaiming — keep them but scale up so the
        # deformation is material).
        with torch.no_grad():
            ref_conv.offset_bias += torch.from_numpy(
                rng.normal(scale=0.3, size=ref_conv.offset_bias.shape).astype(np.float32)
            )
    finally:
        os.chdir(cwd)
    nq, ns, h = 21, 33, 9
    q = rng.normal(size=(nq, 3)).astype(np.float32)
    s = rng.normal(size=(ns, 3)).astype(np.float32)
    neighb = rng.integers(0, ns + 1, size=(nq, h)).astype(np.int64)
    x = rng.normal(size=(ns, 5)).astype(np.float32)

    with torch.no_grad():
        want = ref_conv(
            torch.from_numpy(q), torch.from_numpy(s),
            torch.from_numpy(neighb), torch.from_numpy(x),
        ).numpy()

    from pcrcg_tpu.models.kpconv import kpconv, kpconv_deformable

    k = 15
    jq, js = jnp.asarray(q), jnp.asarray(s)
    jn = jnp.asarray(neighb.astype(np.int32))
    jx = jnp.asarray(x)
    offset_feats = kpconv(
        jq, js, jn, jx,
        jnp.asarray(ref_conv.offset_conv.kernel_points.detach().numpy()),
        jnp.asarray(ref_conv.offset_conv.weights.detach().numpy()),
        1.1, "linear", "sum",
    ) + jnp.asarray(ref_conv.offset_bias.detach().numpy())
    unscaled = offset_feats[:, : 3 * k].reshape(nq, k, 3)
    offsets = unscaled * 1.1
    mods = 2.0 * jax.nn.sigmoid(offset_feats[:, 3 * k:]) if modulated else None
    got = np.asarray(
        kpconv_deformable(
            jq, js, jn, jx,
            jnp.asarray(ref_conv.kernel_points.detach().numpy()),
            jnp.asarray(ref_conv.weights.detach().numpy()),
            1.1, offsets, mods, "linear", "sum",
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kpfcnn_full_model_import_parity(rng):
    """FULL-MODEL oracle: a reference torch KPFCNN (random init) exported
    as a state dict, imported via torch_import.import_kpfcnn_state_dict,
    must produce the same descriptors/scores as our KPFCNN on the same
    pair — same neighbor lists fed to both (ours converted to the
    reference's stacked-ragged batch layout).  Validates the checkpoint
    importer AND the whole architecture transcription end to end."""
    import jax
    from pcrcg_tpu.data.pair import make_pair_batch
    from pcrcg_tpu.models.kpfcnn import KPFCNN
    from pcrcg_tpu.models.torch_import import import_kpfcnn_state_dict
    from pcrcg_tpu.ops.pyramid import build_pyramid

    cfg = tiny_test_config()

    class RCfg:
        architecture = list(cfg.architecture)
        first_subsampling_dl = cfg.first_subsampling_dl
        conv_radius = cfg.conv_radius
        in_feats_dim = cfg.in_feats_dim
        first_feats_dim = cfg.first_feats_dim
        image_feature = False
        img_num = 1
        init_mode = ""
        node_overlap = False
        quaternion = False
        num_kernel_points = cfg.num_kernel_points
        final_feats_dim = cfg.final_feats_dim
        gnn_feats_dim = cfg.gnn_feats_dim
        num_head = cfg.num_head
        dgcnn_k = cfg.dgcnn_k
        nets = list(cfg.nets)
        KP_extent = cfg.KP_extent
        KP_influence = cfg.KP_influence
        aggregation_mode = cfg.aggregation_mode
        fixed_kernel_points = cfg.fixed_kernel_points
        in_points_dim = 3
        modulated = False
        use_batch_norm = True
        batch_norm_momentum = 0.02
        deform_radius = 5.0

    if REF not in sys.path:
        sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)  # load_kernels reads kernels/dispositions relatively
    try:
        from models.architectures import KPFCNN as RefKPFCNN

        torch.manual_seed(3)
        ref = RefKPFCNN(RCfg())
    finally:
        os.chdir(cwd)
    ref.eval()
    state_dict = {k: v for k, v in ref.state_dict().items()}

    # Our pair + pyramid (exact searches on CPU).
    cfg = cfg.replace(node_overlap=False, quaternion=False)
    nprng = np.random.default_rng(7)
    src = nprng.uniform(0, 0.5, size=(130, 3)).astype(np.float32)
    tgt = (src[15:118] + nprng.normal(scale=0.003, size=(103, 3))).astype(np.float32)
    batch = make_pair_batch(
        [dict(src_pcd=src, tgt_pcd=tgt, rot=np.eye(3), trans=np.zeros(3))],
        cfg.budgets.points[0],
    )
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets,
        cfg.first_subsampling_dl, cfg.conv_radius,
    )

    model = KPFCNN(cfg)
    variables = model.init(jax.random.key(0), pyr, batch.features[0])
    variables, report = import_kpfcnn_state_dict(state_dict, variables)
    assert not report["errors"], report["errors"]
    # Every KPConv weight and kernel disposition must have been imported.
    n_kpconv = sum(1 for k in state_dict if k.endswith("KPConv.weights"))
    assert n_kpconv == sum(
        1 for b in cfg.architecture if ("simple" in b or "resnetb" in b)
    )

    got = model.apply(variables, pyr, batch.features[0])

    # ---- Convert OUR pyramid to the reference's stacked-ragged batch ----
    masks = [np.asarray(m) for m in pyr.masks]
    reals = [[np.flatnonzero(m[c]) for c in range(2)] for m in masks]
    lens = [[len(r[0]), len(r[1])] for r in reals]

    def stack_idx(idx2, sup_lvl, q_lvl):
        """Per-cloud padded neighbor lists -> stacked-real indices
        (shadow = total stacked length)."""
        total = sum(lens[sup_lvl])
        cols = []
        for c in range(2):
            ns_pad = masks[sup_lvl][c].shape[0]
            remap = np.full(ns_pad + 1, total, np.int64)
            remap[reals[sup_lvl][c]] = (
                np.arange(lens[sup_lvl][c]) + (0 if c == 0 else lens[sup_lvl][0])
            )
            cols.append(remap[np.asarray(idx2[c])[reals[q_lvl][c]]])
        return torch.from_numpy(np.concatenate(cols, 0))

    def stack_pts(lvl):
        pts = np.asarray(pyr.points[lvl])
        return torch.from_numpy(
            np.concatenate([pts[0][reals[lvl][0]], pts[1][reals[lvl][1]]], 0)
        )

    n_levels = len(pyr.points)
    ref_batch = {
        "points": [stack_pts(l) for l in range(n_levels)],
        "neighbors": [
            stack_idx(pyr.neighbors[l], l, l) for l in range(n_levels)
        ],
        "pools": [
            stack_idx(pyr.pools[l], l, l + 1) for l in range(n_levels - 1)
        ],
        "upsamples": [
            stack_idx(pyr.upsamples[l], l + 1, l) for l in range(n_levels - 1)
        ],
        "stack_lengths": [torch.tensor(lens[l]) for l in range(n_levels)],
        "features": torch.ones((sum(lens[0]), cfg.in_feats_dim)),
        "src_pcd_raw": torch.from_numpy(src),
        "tgt_pcd_raw": torch.from_numpy(tgt),
    }
    with torch.no_grad():
        want = ref(ref_batch)

    want_feats = want["feats_f"].numpy()
    want_ov = want["scores_overlap"].numpy()
    want_sal = want["scores_saliency"].numpy()

    got_feats = np.concatenate(
        [np.asarray(got["feats_f"][c])[reals[0][c]] for c in range(2)], 0
    )
    got_ov = np.concatenate(
        [np.asarray(got["scores_overlap"][c])[reals[0][c]] for c in range(2)]
    )
    got_sal = np.concatenate(
        [np.asarray(got["scores_saliency"][c])[reals[0][c]] for c in range(2)]
    )
    np.testing.assert_allclose(got_feats, want_feats, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got_ov, want_ov, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got_sal, want_sal, rtol=2e-3, atol=2e-3)


def test_load_kpfcnn_from_torch_file(tmp_path, rng):
    """File-level wrapper: a torch.save'd {'state_dict': ...} checkpoint
    (the reference's snapshot layout) loads through load_kpfcnn."""
    import jax
    from pcrcg_tpu.data.pair import make_pair_batch
    from pcrcg_tpu.models.kpfcnn import KPFCNN
    from pcrcg_tpu.models.torch_import import load_kpfcnn
    from pcrcg_tpu.ops.pyramid import build_pyramid

    cfg = tiny_test_config()
    nprng = np.random.default_rng(8)
    base = nprng.uniform(0, 0.5, size=(120, 3)).astype(np.float32)
    batch = make_pair_batch(
        [dict(src_pcd=base, tgt_pcd=base[10:110], rot=np.eye(3), trans=np.zeros(3))],
        cfg.budgets.points[0],
    )
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets,
        cfg.first_subsampling_dl, cfg.conv_radius,
    )
    model = KPFCNN(cfg)
    variables = model.init(jax.random.key(0), pyr, batch.features[0])

    # Synthesize a reference-layout checkpoint carrying one recognizable
    # tensor (an encoder KPConv weight) and assert it lands.
    w = np.asarray(variables["params"]["encoder_0"]["KPConv"]["weights"])
    marked = np.full_like(w, 0.125)
    path = tmp_path / "model_best_recall.pth"
    torch.save(
        {"state_dict": {"encoder_blocks.0.KPConv.weights": torch.from_numpy(marked)},
         "epoch": 3},
        path,
    )
    new_vars, report = load_kpfcnn(str(path), variables, strict=False)
    assert report["loaded"] == 1
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["encoder_0"]["KPConv"]["weights"]), marked
    )


def test_kpfcnn_export_import_round_trip(rng):
    """export_kpfcnn_state_dict (our -> reference torch format) must
    round-trip exactly through import_kpfcnn_state_dict."""
    import jax
    from pcrcg_tpu.data.pair import make_pair_batch
    from pcrcg_tpu.models.kpfcnn import KPFCNN
    from pcrcg_tpu.models.torch_import import (
        export_kpfcnn_state_dict,
        import_kpfcnn_state_dict,
    )
    from pcrcg_tpu.ops.pyramid import build_pyramid

    cfg = tiny_test_config(node_overlap=True, quaternion=True)
    nprng = np.random.default_rng(9)
    base = nprng.uniform(0, 0.5, size=(120, 3)).astype(np.float32)
    batch = make_pair_batch(
        [dict(src_pcd=base, tgt_pcd=base[10:110], rot=np.eye(3), trans=np.zeros(3))],
        cfg.budgets.points[0],
    )
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets,
        cfg.first_subsampling_dl, cfg.conv_radius,
    )
    model = KPFCNN(cfg)
    v1 = model.init(jax.random.key(1), pyr, batch.features[0])
    v2 = model.init(jax.random.key(2), pyr, batch.features[0])

    sd = export_kpfcnn_state_dict(v1)
    merged, report = import_kpfcnn_state_dict(sd, v2)
    assert not report["errors"], report["errors"]
    flat1 = jax.tree_util.tree_flatten_with_path(
        {"params": v1["params"], "constants": v1["constants"]}
    )[0]
    flatm = dict(jax.tree_util.tree_flatten_with_path(
        {"params": merged["params"], "constants": merged["constants"]}
    )[0])
    assert len(flat1) == len(flatm)
    for path, val in flat1:
        np.testing.assert_array_equal(np.asarray(val), np.asarray(flatm[path]),
                                      err_msg=str(path))
