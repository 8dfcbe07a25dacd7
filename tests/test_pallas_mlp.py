"""Fused SwiGLU-MLP GEMV kernel vs the XLA reference (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.ops.pallas_mlp import pallas_mlp_gemv

pytestmark = pytest.mark.quick


def _ref(x, g, u, d):
    a = jnp.dot(x, g, preferred_element_type=jnp.float32)
    b = jnp.dot(x, u, preferred_element_type=jnp.float32)
    h = (a * jax.nn.sigmoid(a) * b).astype(x.dtype)
    return jnp.dot(h, d, preferred_element_type=jnp.float32).astype(x.dtype)


@pytest.mark.parametrize("m,h,i", [(4, 128, 512), (1, 256, 1024), (8, 128, 256)])
def test_mlp_gemv_matches_xla(m, h, i):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (m, h), jnp.float32) * 0.5
    g = jax.random.normal(ks[1], (h, i), jnp.float32) * 0.05
    u = jax.random.normal(ks[2], (h, i), jnp.float32) * 0.05
    d = jax.random.normal(ks[3], (i, h), jnp.float32) * 0.05
    got = pallas_mlp_gemv(x, g, u, d, tile_i=256, interpret=True)
    want = _ref(x, g, u, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-3)


def test_mlp_gemv_bf16():
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    x = (jax.random.normal(ks[0], (4, 128)) * 0.5).astype(jnp.bfloat16)
    g = (jax.random.normal(ks[1], (128, 512)) * 0.05).astype(jnp.bfloat16)
    u = (jax.random.normal(ks[2], (128, 512)) * 0.05).astype(jnp.bfloat16)
    d = (jax.random.normal(ks[3], (512, 128)) * 0.05).astype(jnp.bfloat16)
    got = np.asarray(pallas_mlp_gemv(x, g, u, d, tile_i=256, interpret=True), np.float32)
    want = np.asarray(_ref(x, g, u, d), np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=6e-2)
