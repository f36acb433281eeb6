import jax.numpy as jnp
import numpy as np

from pcrcg_tpu.ops.masked import PAD_COORD
from pcrcg_tpu.ops.neighbors import knn_search, min_dist_sq, radius_search


def oracle_radius_neighbors(queries, supports, radius, k):
    """Tiny numpy oracle replicating the C++ semantics (reference
    cpp_neighbors/neighbors.cpp:211-332): per query, indices of supports
    within radius sorted ascending by distance, padded with len(supports)."""
    ns = len(supports)
    out = np.full((len(queries), k), ns, dtype=np.int32)
    for i, q in enumerate(queries):
        d = np.linalg.norm(supports - q, axis=1)
        idx = np.argsort(d, kind="stable")
        idx = idx[d[idx] <= radius][:k]
        out[i, : len(idx)] = idx
    return out


def pad(points, n, fill=PAD_COORD):
    out = np.full((n, 3), fill, dtype=np.float32)
    out[: len(points)] = points
    mask = np.zeros(n, bool)
    mask[: len(points)] = True
    return out, mask


def test_radius_search_matches_oracle(rng):
    sup = rng.normal(size=(57, 3)).astype(np.float32)
    que = rng.normal(size=(23, 3)).astype(np.float32)
    radius, k = 0.8, 10
    sup_p, sup_m = pad(sup, 64)
    que_p, _ = pad(que, 32)

    got = np.asarray(radius_search(jnp.asarray(que_p), jnp.asarray(sup_p), jnp.asarray(sup_m), radius, k, query_chunk=16))
    want = oracle_radius_neighbors(que, sup, radius, k)
    # padded support index: oracle uses 57, ours uses 64 (budget). Map both to -1.
    got_q = got[:23].copy()
    got_q[got_q == 64] = -1
    want[want == 57] = -1
    # distances (not exact index order for ties) must agree
    for i in range(23):
        gi, wi = got_q[i], want[i]
        assert (gi >= 0).sum() == (wi >= 0).sum(), f"count mismatch row {i}"
        dg = sorted(np.linalg.norm(sup[gi[gi >= 0]] - que[i], axis=1))
        dw = sorted(np.linalg.norm(sup[wi[wi >= 0]] - que[i], axis=1))
        np.testing.assert_allclose(dg, dw, atol=1e-5)
        # ascending order
        assert np.all(np.diff(dg) >= -1e-6)


def test_radius_search_pad_queries_get_shadow_rows(rng):
    sup = rng.normal(size=(20, 3)).astype(np.float32)
    sup_p, sup_m = pad(sup, 32)
    que_p, que_m = pad(sup[:5], 16)
    got = np.asarray(radius_search(jnp.asarray(que_p), jnp.asarray(sup_p), jnp.asarray(sup_m), 0.5, 8, query_chunk=16))
    assert np.all(got[~que_m] == 32)


def test_radius_search_excludes_masked_supports(rng):
    sup = np.zeros((8, 3), np.float32)
    sup_m = np.zeros(8, bool)
    sup_m[:4] = True  # only first 4 are real, all at origin
    que = np.zeros((4, 3), np.float32)
    got = np.asarray(radius_search(jnp.asarray(que), jnp.asarray(sup), jnp.asarray(sup_m), 0.1, 8, query_chunk=4))
    for row in got:
        real = row[row < 8]
        assert set(real.tolist()) == {0, 1, 2, 3}


def test_knn_and_min_dist(rng):
    sup = rng.normal(size=(40, 3)).astype(np.float32)
    que = rng.normal(size=(10, 3)).astype(np.float32)
    sup_p, sup_m = pad(sup, 48)
    idx, d2 = knn_search(jnp.asarray(que), jnp.asarray(sup_p), jnp.asarray(sup_m), 5, query_chunk=8)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    md = np.asarray(min_dist_sq(jnp.asarray(que), jnp.asarray(sup_p), jnp.asarray(sup_m), query_chunk=8))
    for i in range(10):
        d = np.sum((sup - que[i]) ** 2, axis=1)
        order = np.argsort(d)[:5]
        np.testing.assert_allclose(np.sort(d2[i]), d[order], atol=1e-4)
        np.testing.assert_allclose(md[i], d[order[0]], atol=1e-4)
