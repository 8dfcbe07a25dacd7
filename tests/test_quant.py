"""Weight-only int8 quantization: roundtrip error, transparent matmul
dispatch, quantized forward fidelity, and a quantized end-to-end decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.models import llm, qwen2
from flowmirror_hydravox_tpu.ops import quant
from flowmirror_hydravox_tpu.ops.sampling import SamplingParams

CFG = tiny_config().llm

pytestmark = pytest.mark.quick


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 48)) * 0.02
    w8, scale = quant.quantize_weight_int8(w)
    assert w8.dtype == jnp.int8 and scale.shape == (4, 1, 48)
    back = w8.astype(jnp.float32) * scale
    # symmetric per-channel: max error is half a quantization step
    err = np.abs(np.asarray(back - w))
    step = np.asarray(scale)
    assert (err <= 0.5 * step + 1e-8).all()


def test_matmul_q_matches_dense():
    rng = jax.random.PRNGKey(1)
    w = jax.random.normal(rng, (32, 48)) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 32))
    layer_q = quant.quantize_layer_dict({"w": w}, ["w"])
    dense = x @ w
    q = quant.matmul_q(x, layer_q, "w")
    rel = np.abs(np.asarray(q - dense)).max() / (np.abs(np.asarray(dense)).max() + 1e-9)
    assert rel < 0.02
    # transparent on unquantized dicts
    np.testing.assert_allclose(np.asarray(quant.matmul_q(x, {"w": w}, "w")), np.asarray(dense))


def test_quantized_llm_forward_close():
    params = llm.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    qparams = quant.quantize_llm_params(params)
    assert quant.quantized_fraction(qparams) > 0.5
    # MTP dead projections stay dense
    assert qparams["mtp_block"]["q_proj_w"].dtype != jnp.int8

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 7, CFG.backbone.hidden_size)) * 0.3
    dense = qwen2.forward(params["backbone"], CFG.backbone, x, unroll=False)
    q = qwen2.forward(qparams["backbone"], CFG.backbone, x, unroll=False)
    # residual stream under 0.4%-per-weight noise: expect close, not exact
    cos = np.sum(np.asarray(dense) * np.asarray(q)) / (
        np.linalg.norm(np.asarray(dense)) * np.linalg.norm(np.asarray(q))
    )
    assert cos > 0.999

    hl_d = llm.mtp_logits(params, CFG, dense[:, -1], CFG.head_num)
    hl_q = llm.mtp_logits(qparams, CFG, dense[:, -1], CFG.head_num)
    corr = np.corrcoef(np.asarray(hl_d).ravel(), np.asarray(hl_q).ravel())[0, 1]
    assert corr > 0.995


def test_quantized_generate_runs():
    params = llm.init_params(jax.random.PRNGKey(0), CFG, jnp.bfloat16)
    qparams = quant.quantize_llm_params(params)
    text = jnp.arange(6, dtype=jnp.int32)
    emb, plen = llm.build_inference_prompt(
        qparams, CFG, text, jnp.int32(6), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    res = llm.generate(
        qparams, CFG, jax.random.PRNGKey(7), emb, plen,
        jnp.int32(2), jnp.int32(16), SamplingParams.make(),
        inference_head_num=2, max_tokens=16,
    )
    n = int(res.num_tokens)
    assert 0 < n <= 16
    toks = np.asarray(res.tokens[:n])
    assert (toks >= 0).all() and (toks < CFG.speech_token_size).all()
