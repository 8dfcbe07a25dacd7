"""Pallas fused decode attention vs the XLA reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from flowmirror_hydravox_tpu.ops.attention import decode_attention
from flowmirror_hydravox_tpu.ops.pallas_attention import pallas_decode_attention


def _case(kblk, hq, hkv, d, s_max, cache_len, seed):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((kblk, hq, d)).astype(np.float32)
    k = rng.standard_normal((s_max, hkv, d)).astype(np.float32)
    v = rng.standard_normal((s_max, hkv, d)).astype(np.float32)
    # zero out "unwritten" region beyond cache_len + kblk for realism
    k[cache_len + kblk :] = 0
    v[cache_len + kblk :] = 0

    ref = decode_attention(
        jnp.asarray(q)[None], jnp.asarray(k)[None], jnp.asarray(v)[None],
        jnp.asarray([cache_len], jnp.int32),
    )[0]
    got = pallas_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.int32(cache_len),
        s_blk=min(64, s_max), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_single_token_gqa():
    _case(kblk=1, hq=4, hkv=2, d=16, s_max=128, cache_len=37, seed=0)


def test_mtp_block_gqa():
    """K=4 new tokens, GQA 14:2 (flagship head layout, small dim)."""
    _case(kblk=4, hq=14, hkv=2, d=16, s_max=128, cache_len=61, seed=1)


def test_multiple_blocks():
    """cache spanning several S-blocks exercises the online softmax."""
    _case(kblk=2, hq=4, hkv=4, d=16, s_max=256, cache_len=190, seed=2)


def test_block_boundary():
    _case(kblk=2, hq=4, hkv=2, d=16, s_max=128, cache_len=62, seed=3)
