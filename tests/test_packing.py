"""pack_pytree: exact round-trip of a mixed-dtype nested tree, and
jit-traceability of the unpack (the whole point — dispatch carries a
handful of flat buffers, the tree reassembles inside the program)."""
import jax
import jax.numpy as jnp
import numpy as np

from pcrcg_tpu.utils.packing import pack_pytree


def _tree(rng):
    return {
        "a": {"w": jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32)),
              "b": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))},
        "idx": jnp.asarray(rng.integers(0, 10, size=(4, 2)), jnp.int32),
        "scalar": jnp.asarray(2.5, jnp.float32),
        "flag": jnp.asarray([True, False]),
    }


def test_pack_round_trip():
    tree = _tree(np.random.default_rng(0))
    pack, unpack = pack_pytree(tree)
    packed = pack(tree)
    # One buffer per dtype, all 1-D.
    assert all(v.ndim == 1 for v in packed.values())
    assert len(packed) == 3  # float32, int32, bool
    out = unpack(packed)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        tree, out,
    )


def test_unpack_inside_jit():
    tree = _tree(np.random.default_rng(1))
    pack, unpack = pack_pytree(tree)

    @jax.jit
    def f(packed):
        t = unpack(packed)
        return jnp.sum(t["a"]["w"]) + jnp.sum(t["idx"].astype(jnp.float32))

    expect = float(jnp.sum(tree["a"]["w"])) + float(jnp.sum(tree["idx"]))
    assert abs(float(f(pack(tree))) - expect) < 1e-5
