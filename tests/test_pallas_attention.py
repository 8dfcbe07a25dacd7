"""Pallas fused decode attention vs the XLA reference (interpreter mode on CPU)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from flowmirror_hydravox_tpu.ops.attention import decode_attention
from flowmirror_hydravox_tpu.ops.pallas_attention import pallas_decode_attention

pytestmark = pytest.mark.quick



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


def test_generate_loop_pallas_vs_xla():
    """End-to-end MTP generate(): the production decode path dispatched to the
    Pallas kernel (interpreter mode) must produce the exact same tokens as the
    XLA decode path (VERDICT r1 item 2: kernel wired into the served path)."""
    from flowmirror_hydravox_tpu.config import tiny_config
    from flowmirror_hydravox_tpu.models import llm as llm_model
    from flowmirror_hydravox_tpu.ops.attention import set_pallas_decode
    from flowmirror_hydravox_tpu.ops.sampling import SamplingParams

    cfg = tiny_config().llm
    params = llm_model.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    prompt = jax.random.normal(
        jax.random.PRNGKey(1), (16, cfg.backbone.hidden_size), jnp.float32
    )
    kwargs = dict(
        prompt_embeds=prompt,
        prompt_len=jnp.int32(11),
        min_len=jnp.int32(4),
        max_len=jnp.int32(24),
        sampling=SamplingParams.make(top_p=0.9, top_k=10, win_size=10, tau_r=0.1),
        inference_head_num=2,
        max_tokens=32,
    )

    def run():
        out = llm_model.generate(params, cfg, jax.random.PRNGKey(7), **kwargs)
        return np.asarray(out.tokens), int(out.num_tokens), int(out.steps)

    try:
        set_pallas_decode(False)
        tok_xla, n_xla, steps_xla = run()
        set_pallas_decode(True, interpret=True)
        tok_pallas, n_pallas, steps_pallas = run()
    finally:
        set_pallas_decode(None)

    assert n_pallas == n_xla and steps_pallas == steps_xla
    np.testing.assert_array_equal(tok_pallas[:n_pallas], tok_xla[:n_xla])
    assert n_xla > 0
