"""Roofline / MFU estimate for the geometry registration pipeline
(VERDICT r5 item 4): per-stage FLOPs and bytes at bench sizes, compared
against v5e per-chip peaks, so the measured device time can be judged
against speed-of-light rather than against itself.

Pure host math — walks the same ArchitecturePlan the model builds from
(models/kpfcnn.py plan_architecture) plus the pyramid search geometry
(ops/tiled_search.py), and applies the round-3 VPU cost model
(PERF.md) to the candidate-DMA kernels.  No jax/device use.

v5e per-chip peaks used (public numbers):
  MXU   197 TFLOP/s bf16 (XLA's default f32 matmul = ONE bf16 pass ->
        same rate; Precision.HIGHEST = 6 passes -> /6)
  VPU   ~1 T op/s effective (measured grade, PERF.md round-3 model;
        theoretical 8x128x4 ALUs at 940 MHz ~ 3.8 T op/s — the model's
        0.85-1 T effective covers convert/select-heavy code)
  HBM   819 GB/s
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcrcg_tpu.config import Config
from pcrcg_tpu.models.kpfcnn import plan_architecture

MXU_BF16 = 197e12
MXU_F32_HIGHEST = MXU_BF16 / 6.0
VPU = 1.0e12
HBM = 819e9

K = 15  # kernel points


def main():
    cfg = Config()
    b = cfg.budgets
    plan = plan_architecture(cfg)
    pts = [2 * n for n in b.points]  # both clouds ride one dispatch
    H = b.neighbors

    rows = []

    def add(stage, flops, unit_rate, bytes_=0.0, note=""):
        t_flop = flops / unit_rate * 1e3
        t_mem = bytes_ / HBM * 1e3
        rows.append((stage, flops, bytes_, max(t_flop, t_mem), note))

    # --- pyramid: tiled searches (distance matmuls at HIGHEST) ---
    # conv search at level l: queries pts[l], candidates m_tiles*128
    for lvl in range(b.num_levels):
        m = b.m_tiles_at(lvl) * b.search_tile
        nq = pts[lvl]
        add(
            f"search conv L{lvl}", 2 * nq * m * 3, MXU_F32_HIGHEST,
            bytes_=nq * m * 4,  # the [Nq, m] distance tile write+read
            note=f"{nq}x{m} dist + approx_top_k sort (sort not in FLOPs)",
        )
        if lvl + 1 < b.num_levels:
            nq_p = pts[lvl + 1]
            add(
                f"search pool L{lvl}", 2 * nq_p * m * 3, MXU_F32_HIGHEST,
                bytes_=nq_p * m * 4,
            )
            add(
                f"search up L{lvl}", 2 * nq * b.m_tiles_at(lvl + 1) * 128 * 3,
                MXU_F32_HIGHEST, bytes_=nq * b.m_tiles_at(lvl + 1) * 128 * 4,
                note="k=1",
            )

    # subsample: one sort per level (report as note only)
    # --- KPConv encoder blocks ---
    for i, bp in enumerate(plan.encoder):
        nq = pts[bp.layer + 1] if bp.strided else pts[bp.layer]
        h = H[bp.layer]
        if bp.kind == "simple":
            cin, cout = bp.in_dim, bp.out_dim // 2
            convs = [(cin, cout)]
            unaries = []
        else:
            q = bp.out_dim // 4
            convs = [(q, q)]
            unaries = [(bp.in_dim, q), (q, bp.out_dim)]
            if bp.in_dim != bp.out_dim:
                unaries.append((bp.in_dim, bp.out_dim))  # shortcut 1x1
        for cin, cout in convs:
            # candidate-DMA kernel VPU cost model (PERF.md round 3):
            # per 128-query group and (c,d) visit:
            #   ef build ~ CAND*H*T ops, reduce ~ 2*K*H*c_blk*T
            groups = nq // 128
            cand = b.m_tiles_at(bp.layer) * b.search_tile
            c8 = 8 * ((cin + 7) // 8) if cin <= 160 else 128 * ((cin + 127) // 128)
            c_blk = min(c8, 128) if c8 > 160 else c8
            c_tiles = max(1, c8 // c_blk)
            d_tiles = max(1, (cout + 255) // 256)
            ef = groups * c_tiles * (cand * h * 128)
            red = groups * c_tiles * d_tiles * (2 * K * h * c_blk * 128)
            add(
                f"enc{i} KPConv vpu ({cin}->{cout}, L{bp.layer}"
                f"{'s' if bp.strided else ''})", ef + red, VPU,
                note=f"ef {ef/1e9:.1f}G + reduce {red/1e9:.1f}G VPU ops",
            )
            # weight contraction [N, K*Cin] x [K*Cin, Cout] rides the MXU
            add(
                f"enc{i} KPConv mxu", 2 * nq * K * cin * cout, MXU_BF16,
                bytes_=4 * (nq * K * cin + K * cin * cout + nq * cout),
            )
        for cin, cout in unaries:
            add(
                f"enc{i} 1x1 ({cin}->{cout})", 2 * nq * cin * cout, MXU_BF16,
                bytes_=4 * (nq * cin + cin * cout + nq * cout),
            )

    # --- bottleneck + GCN (self edge-conv k=10, cross attention) ---
    nc = pts[-1]
    g = cfg.gnn_feats_dim
    add("bottle 1x1", 2 * nc * plan.bottleneck_dim * g, MXU_BF16)
    k_g = cfg.dgcnn_k
    # self layers: 2 rounds of [feat,nbr-feat] 1x1 convs (2g->g) over N*k
    # edges, twice (two self layers) + fuse convs
    add("gcn self x2", 2 * (2 * nc * k_g * 2 * g * g) * 2, MXU_BF16)
    # cross attention: 4 heads, q/k/v/out projections + NxN attention
    n_half = nc // 2
    add("gcn cross proj", 2 * nc * g * g * 4, MXU_BF16)
    add("gcn cross attn", 2 * 2 * n_half * n_half * g * 2, MXU_BF16,
        note="dense N_src x N_tgt")
    # --- decoder (unary blocks on concat dims) ---
    for i, bp in enumerate(plan.decoder):
        nq = pts[bp.layer]
        add(f"dec{i} 1x1 ({bp.in_dim}->{bp.out_dim}, L{bp.layer})",
            2 * nq * bp.in_dim * bp.out_dim, MXU_BF16)

    total_f = sum(r[1] for r in rows)
    total_t = sum(r[3] for r in rows)
    print(f"{'stage':44s} {'GFLOP/Gop':>10s} {'MB':>8s} {'ms@peak':>8s}  note")
    for stage, f, by, t, note in rows:
        print(f"{stage:44s} {f/1e9:10.2f} {by/1e6:8.1f} {t:8.3f}  {note}")
    print(f"\nTOTAL {total_f/1e9:.1f} GFLOP/Gop, speed-of-light sum "
          f"{total_t:.1f} ms per pair-dispatch")


if __name__ == "__main__":
    main()
