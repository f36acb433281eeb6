"""Pallas TPU kernel: candidate-tile distance matrices for the tiled
radius search — no HBM row gathers, no serialized query chunks.

``radius_search_tiled`` (ops/tiled_search.py) prunes each 128-query
group's supports to its ``m_tiles`` nearest Z-order tiles, then needs the
dense [128, m_tiles·tile] squared-distance matrix of the group against
those candidates.  The XLA formulation gathers the candidate tile rows
(``sup_tiles[sel]`` — ~640K latency-bound rows per level-0 search) inside
a ``lax.map`` over query chunks; the chunk loops alone traced at ~12.6 ms
per pyramid (perf_runs/session_r3b).  Tiles are CONTIGUOUS 128-row blocks,
so this kernel instead DMAs each group's candidate tiles from a tile-major
array straight into VMEM (scalar-prefetch on the selected tile ids) and
emits the distance block with one MXU dot:

    d2[q, j] = |q|² + |c_j|² − 2·q·c_j

Precision: Mosaic lowers an f32 dot to ONE bf16 MXU pass (~2⁻⁸ relative —
centimetres on metre-scale scans, unusable for neighbor ranking), so the
cross term runs as the standard 3-product bf16 limb expansion
(hi·hi + hi·lo + lo·hi, ~2⁻¹⁶ relative ≈ 15 µm at 3DMatch scales); |c|²
and |q|² ride in f32 (|c|² precomputed host-side in the tile-major array,
row 3).  Invalid supports carry |c|² = +inf ⇒ d2 = +inf, exactly like the
XLA path's masking (tiled_search.py:90).

The caller (radius_search_tiled with ``use_kernel``) still does tile
selection, top-k, the radius cutoff and local→global resolution in XLA —
this kernel only replaces the gather + distance stage.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 128  # queries per group


def _dist_kernel(
    # scalar-prefetch
    sel_ref,  # [G, M] int32 — candidate tile ids per group
    # inputs
    q_ref,  # [8, T] f32 — query rows: x,y,z,|q|²,(pad)
    supa_ref,  # [n_tiles, 8, tile] f32 in ANY — rows x,y,z,|c|²(inf=invalid)
    # outputs
    d2_ref,  # [T, M*tile] f32
    # scratch
    cand_ref,  # [8, M*tile] f32
    sem,
    *,
    m_tiles: int,
    tile: int,
):
    g = pl.program_id(0)

    copies = []
    for m in range(m_tiles):
        t_id = sel_ref[g, m]
        cp = pltpu.make_async_copy(
            supa_ref.at[t_id],
            cand_ref.at[:, pl.ds(m * tile, tile)],
            sem,
        )
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()

    # 3-limb bf16 split (bit-masked — convert round-trips get folded by
    # the compiler, ops/kpconv_tiled.py:_split_hi_lo): x = h + l1 + l2 to
    # ~2⁻²⁴ relative.  d2 comes from the qsq − 2q·c + csq expansion, so
    # cross-term error is ABSOLUTE in |q||c| (no cancellation rescue for
    # small distances) — a 2-limb cross term (~2⁻¹⁵|q||c|) was ~7% of the
    # level-0 radius² at 3DMatch scales; 3 limbs bring it to ~2⁻²⁴.
    def split3(x):
        mask = jnp.uint32(0xFFFF0000)
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        h = jax.lax.bitcast_convert_type(bits & mask, jnp.float32)
        lo = x - h
        lbits = jax.lax.bitcast_convert_type(lo, jnp.uint32)
        l1 = jax.lax.bitcast_convert_type(lbits & mask, jnp.float32)
        l2 = lo - l1
        return (
            h.astype(jnp.bfloat16),
            l1.astype(jnp.bfloat16),
            l2.astype(jnp.bfloat16),
        )

    qxyz = q_ref[:3, :]  # [3, T]
    cxyz = cand_ref[:3, :]  # [3, CAND]
    qh, ql1, ql2 = split3(qxyz)
    ch, cl1, cl2 = split3(cxyz)

    # Cross term via one 18-row bf16 contraction keeping all products down
    # to ~2⁻²⁴: h·H + h·L1 + l1·H + h·L2 + l2·H + l1·L1.
    qrows = jnp.concatenate([qh, qh, ql1, qh, ql2, ql1], axis=0)  # [18, T]
    crows = jnp.concatenate([ch, cl1, ch, cl2, ch, cl1], axis=0)  # [18, CAND]
    cross = jax.lax.dot_general(
        qrows, crows, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, CAND]

    qsq = jnp.sum(qxyz * qxyz, axis=0)  # [T] f32
    csq = cand_ref[3, :]  # [CAND] f32 (+inf on invalid supports)
    d2_ref[:] = qsq[:, None] - 2.0 * cross + csq[None, :]


def tiled_candidate_distances(
    queries: jnp.ndarray,  # [Nq, 3] f32 (pad rows at PAD_COORD)
    supa: jnp.ndarray,  # [n_tiles, 8, tile] f32 tile-major support rows
    sel: jnp.ndarray,  # [G, M] int32 — G = ceil(Nq/128) groups
    tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> d2 [G·128, M·tile] f32: per group, squared distances of its 128
    queries to the M·tile candidate points (inf where support invalid)."""
    nq = queries.shape[0]
    g_count, m_tiles = sel.shape
    nq_pad = g_count * _T
    cand = m_tiles * tile

    q8 = jnp.zeros((8, nq_pad), jnp.float32)
    q8 = q8.at[:3, :nq].set(queries.T.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_count,),
        in_specs=[
            pl.BlockSpec((8, _T), lambda g, s: (0, g)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_T, cand), lambda g, s: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((8, cand), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_dist_kernel, m_tiles=m_tiles, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq_pad, cand), jnp.float32),
        interpret=interpret,
    )(sel, q8, supa)


def pack_supports_tile_major(
    supports: jnp.ndarray,  # [Ns_pad, 3] f32 (already padded to tile)
    support_mask: jnp.ndarray,  # [Ns_pad] bool
    tile: int = 128,
) -> jnp.ndarray:
    """-> supa [n_tiles, 8, tile] f32: rows x,y,z,|c|² (+inf on invalid),
    one contiguous block per tile — the DMA source for _dist_kernel."""
    ns_pad = supports.shape[0]
    sup_sq = jnp.sum(supports * supports, axis=-1)
    sup_sq = jnp.where(support_mask, sup_sq, jnp.inf)
    rows = jnp.zeros((8, ns_pad), jnp.float32)
    rows = rows.at[:3].set(supports.T.astype(jnp.float32))
    rows = rows.at[3].set(sup_sq)
    return rows.reshape(8, ns_pad // tile, tile).transpose(1, 0, 2)
