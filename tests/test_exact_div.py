"""The quantized image path's on-device dequantization must be
BIT-identical to the loader's numpy division for EVERY representable
input — XLA lowers division-by-constant to multiply-by-reciprocal (1 ulp
off for ~half of all inputs), and the deep 2D backbone chaotically
amplifies a 1-ulp input difference into O(1) feature changes (the bug
test_quantized_image_lift_matches_float caught).  Locks the
two-constant-form property exhaustively."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _device_div(denom):
    c_hi = np.float32(1.0 / denom)
    c_lo = np.float32(1.0 / denom - np.float64(c_hi))

    @jax.jit
    def f(x):
        xf = x.astype(jnp.float32)
        return xf * c_hi + xf * c_lo

    return f


@pytest.mark.parametrize(
    "denom,dtype,n",
    [(255.0, np.uint8, 256), (1000.0, np.uint16, 65536)],
)
def test_two_constant_division_exhaustive(denom, dtype, n):
    x = np.arange(n, dtype=dtype)
    want = x.astype(np.float32) / np.float32(denom)
    got = np.asarray(_device_div(denom)(x))
    np.testing.assert_array_equal(got, want)


def test_plain_division_is_not_exact_on_this_backend():
    """Documents WHY the two-constant form exists: if this starts passing
    (XLA stops rewriting the division), the workaround could be dropped."""
    x = np.arange(65536, dtype=np.uint16)
    want = x.astype(np.float32) / np.float32(1000.0)
    got = np.asarray(jax.jit(lambda v: v.astype(jnp.float32) / 1000.0)(x))
    if (got == want).all():
        pytest.skip("backend division is correctly rounded here")
    assert ((got != want).mean()) > 0.01  # the rewrite is pervasive, not rare
