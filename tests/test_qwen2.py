"""Backbone parity vs HF Qwen2 (torch CPU) + KV-cache self-consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import Qwen2Config
from flowmirror_hydravox_tpu.convert.torch_import import qwen2_from_state_dict
from flowmirror_hydravox_tpu.models import qwen2

CFG = Qwen2Config(
    hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    intermediate_size=128, vocab_size=128, rope_theta=10000.0,
)


def _hf_model():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config as HFConfig
    from transformers.models.qwen2.modeling_qwen2 import Qwen2ForCausalLM

    hf_cfg = HFConfig(
        hidden_size=CFG.hidden_size, num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads, num_key_value_heads=CFG.num_kv_heads,
        intermediate_size=CFG.intermediate_size, vocab_size=CFG.vocab_size,
        rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_norm_eps,
        tie_word_embeddings=True, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    return torch, model


def test_forward_matches_hf():
    torch, model = _hf_model()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = qwen2_from_state_dict(sd, CFG)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, CFG.hidden_size)).astype(np.float32) * 0.1

    with torch.no_grad():
        out = model(
            inputs_embeds=torch.from_numpy(x), output_hidden_states=True, return_dict=True
        )
    ref = out.hidden_states[-1].numpy()

    ours = np.asarray(qwen2.forward(params, CFG, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-4)


def test_cached_block_decode_matches_full_forward():
    rng = jax.random.PRNGKey(1)
    params = qwen2.init_params(rng, CFG, jnp.float32)
    x = jax.random.normal(rng, (1, 12, CFG.hidden_size), jnp.float32) * 0.1

    full = qwen2.forward(params, CFG, x)

    # prefill 8 tokens then two 2-token blocks
    cache = qwen2.init_kv_cache(CFG, 1, 16, jnp.float32)
    h0, cache = qwen2.forward_block_with_cache(params, CFG, x[:, :8], cache)
    h1, cache = qwen2.forward_block_with_cache(params, CFG, x[:, 8:10], cache)
    h2, cache = qwen2.forward_block_with_cache(params, CFG, x[:, 10:12], cache)
    blocks = jnp.concatenate([h0, h1, h2], axis=1)
    np.testing.assert_allclose(np.asarray(blocks), np.asarray(full), atol=1e-5, rtol=1e-4)


def test_uncommitted_slots_are_shadowed():
    """MTP semantics: write K tokens, commit fewer; the stale slots must be
    overwritten by the next block before they can influence attention."""
    rng = jax.random.PRNGKey(2)
    params = qwen2.init_params(rng, CFG, jnp.float32)
    x = jax.random.normal(rng, (1, 8, CFG.hidden_size), jnp.float32) * 0.1
    garbage = jax.random.normal(jax.random.PRNGKey(9), (1, 2, CFG.hidden_size), jnp.float32)

    full = qwen2.forward(params, CFG, x)

    cache = qwen2.init_kv_cache(CFG, 1, 16, jnp.float32)
    h0, cache = qwen2.forward_block_with_cache(params, CFG, x[:, :4], cache)
    # write block [x4, x5, garbage, garbage] but commit only 2
    blk = jnp.concatenate([x[:, 4:6], garbage], axis=1)
    h1, cache = qwen2.forward_block_with_cache(
        params, CFG, blk, cache, advance=jnp.array([2], jnp.int32)
    )
    # next block overwrites the garbage slots
    h2, cache = qwen2.forward_block_with_cache(params, CFG, x[:, 6:8], cache)
    got = jnp.concatenate([h0, h1[:, :2], h2], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=1e-5, rtol=1e-4)


def test_right_padded_prefill():
    """Prefill padded past the true length: hidden at true_len-1 must match."""
    rng = jax.random.PRNGKey(3)
    params = qwen2.init_params(rng, CFG, jnp.float32)
    x = jax.random.normal(rng, (1, 6, CFG.hidden_size), jnp.float32) * 0.1
    x_pad = jnp.pad(x, ((0, 0), (0, 4), (0, 0)))

    full = qwen2.forward(params, CFG, x)
    cache = qwen2.init_kv_cache(CFG, 1, 16, jnp.float32)
    h, cache = qwen2.forward_block_with_cache(
        params, CFG, x_pad, cache, advance=jnp.array([6], jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(h[:, 5]), np.asarray(full[:, 5]), atol=1e-5, rtol=1e-4)
    # continue decoding after padded prefill
    nxt = jax.random.normal(jax.random.PRNGKey(5), (1, 2, CFG.hidden_size), jnp.float32) * 0.1
    h2, cache = qwen2.forward_block_with_cache(params, CFG, nxt, cache)
    full2 = qwen2.forward(params, CFG, jnp.concatenate([x, nxt], axis=1))
    np.testing.assert_allclose(np.asarray(h2), np.asarray(full2[:, 6:]), atol=1e-5, rtol=1e-4)


def test_unrolled_remat_matches_scan_forward_and_grad():
    """The TPU training path (unroll=True, per-layer dots_saveable remat) must
    match the scanned path in both forward values and gradients."""
    rng = jax.random.PRNGKey(5)
    params = qwen2.init_params(rng, CFG, jnp.float32)
    x = jax.random.normal(rng, (2, 7, CFG.hidden_size), jnp.float32) * 0.1
    lengths = jnp.asarray([7, 5])

    def loss(p, unroll):
        return jnp.sum(qwen2.forward(p, CFG, x, lengths, unroll=unroll) ** 2)

    f_scan, g_scan = jax.value_and_grad(lambda p: loss(p, False))(params)
    f_unr, g_unr = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(f_unr), float(f_scan), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_unr), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
