"""Flow/CFM/DiT: shapes, determinism, noise-buffer parity, streaming mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.models import dit, flow

CFG = tiny_config().flow


@pytest.fixture(scope="module")
def params():
    return flow.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)


def test_rand_noise_matches_torch_reference():
    """flow_matching.py:200-201: set_all_random_seed(0); torch.randn([1,80,15000])."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    ref = torch.randn([1, 80, 15000]).numpy()[:, :, : CFG.rand_noise_len]
    got = flow.make_rand_noise(CFG)
    np.testing.assert_array_equal(got, ref)


def test_inference_shapes_and_determinism(params):
    tok = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, CFG.vocab_size)
    valid = jnp.ones((1, 12), bool)
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 192))
    mel1 = flow.inference(params, CFG, tok, valid, jnp.zeros((1, 0, 80)), jnp.int32(0), emb)
    mel2 = flow.inference(params, CFG, tok, valid, jnp.zeros((1, 0, 80)), jnp.int32(0), emb)
    assert mel1.shape == (1, 80, 12 * CFG.token_mel_ratio)
    np.testing.assert_array_equal(np.asarray(mel1), np.asarray(mel2))  # fixed noise
    assert np.isfinite(np.asarray(mel1)).all()


def test_inference_with_prompt(params):
    """Prompt tokens + prompt mel occupy the head; caller slices them off."""
    lp, lt = 4, 8
    tok = jax.random.randint(jax.random.PRNGKey(3), (1, lp + lt), 0, CFG.vocab_size)
    valid = jnp.ones((1, lp + lt), bool)
    prompt_feat = jax.random.normal(jax.random.PRNGKey(4), (1, lp * 2, 80))
    emb = jax.random.normal(jax.random.PRNGKey(5), (1, 192))
    mel = flow.inference(params, CFG, tok, valid, prompt_feat, jnp.int32(lp * 2), emb)
    assert mel.shape == (1, 80, (lp + lt) * 2)
    out = mel[:, :, lp * 2 :]
    assert out.shape[2] == lt * 2


def test_compute_loss_finite(params):
    rng = jax.random.PRNGKey(6)
    tok = jax.random.randint(rng, (2, 10), 0, CFG.vocab_size)
    feat = jax.random.normal(rng, (2, 20, 80))
    emb = jax.random.normal(rng, (2, 192))
    loss = flow.compute_loss(
        params, CFG, rng, tok, jnp.asarray([10, 7]), feat, jnp.asarray([20, 14]), emb
    )
    assert np.isfinite(float(loss))

    # gradient flows
    g = jax.grad(
        lambda p: flow.compute_loss(
            p, CFG, rng, tok, jnp.asarray([10, 7]), feat, jnp.asarray([20, 14]), emb
        )
    )(params)
    gn = float(
        jnp.sqrt(
            sum(jnp.sum(x ** 2) for x in jax.tree.leaves(g["estimator"]))
        )
    )
    assert np.isfinite(gn) and gn > 0


def test_streaming_chunk_mask_is_causal_in_chunks(params):
    """With the static chunk mask, frames in chunk c must not depend on tokens
    in later chunks (reference equivalence harness, flow.py:433-459)."""
    chunk = CFG.estimator.static_chunk_size  # mel frames per chunk
    n_tok = chunk  # 2 chunks of mel after x2 upsampling... keep small: 1 chunk
    tok = jax.random.randint(jax.random.PRNGKey(7), (1, n_tok), 0, CFG.vocab_size)
    emb = jax.random.normal(jax.random.PRNGKey(8), (1, 192))
    valid = jnp.ones((1, n_tok), bool)

    mel_full = flow.inference(
        params, CFG, tok, valid, jnp.zeros((1, 0, 80)), jnp.int32(0), emb, streaming=True
    )

    # perturb tokens in the last chunk only; first-chunk mel must be unchanged
    # except through the pre-lookahead conv (3-token lookahead -> 6 mel frames)
    tok2 = tok.at[:, -(chunk // 4):].set(
        (tok[:, -(chunk // 4):] + 1) % CFG.vocab_size
    )
    mel_pert = flow.inference(
        params, CFG, tok2, valid, jnp.zeros((1, 0, 80)), jnp.int32(0), emb, streaming=True
    )
    la_mel = (CFG.pre_lookahead_len + 2) * CFG.token_mel_ratio
    boundary = chunk  # first chunk = frames [0, chunk)
    safe = boundary - la_mel - (chunk // 4) * CFG.token_mel_ratio
    if safe > 0:
        diff = np.abs(np.asarray(mel_full - mel_pert))[:, :, :safe]
        np.testing.assert_allclose(diff, 0.0, atol=1e-5)


def test_dit_cfg_batch(params):
    """Estimator handles the CFG batch-2 layout (cond row + zeroed row)."""
    t_mel = 16
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 80, t_mel))
    mask = jnp.ones((2, 1, t_mel))
    mu = jax.random.normal(jax.random.PRNGKey(10), (2, CFG.input_size, t_mel))
    spks = jax.random.normal(jax.random.PRNGKey(11), (2, 80))
    cond = jnp.zeros((2, 80, t_mel))
    out = dit.forward(
        params["estimator"], CFG.estimator, x, mask, mu,
        jnp.asarray([0.3, 0.3]), spks, cond,
    )
    assert out.shape == (2, 80, t_mel)
    assert np.isfinite(np.asarray(out)).all()


def test_dropout_active_in_training_only():
    """Train-time dropout (reference encoder.py:46, DiT modules 0.1): loss
    varies with the dropout rng; inference path has no dropout."""
    import jax
    import jax.numpy as jnp

    from flowmirror_hydravox_tpu.config import tiny_config
    from flowmirror_hydravox_tpu.models import flow as flow_model

    cfg = tiny_config().flow
    params = flow_model.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tok = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    tl = jnp.asarray([8, 6])
    feat = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 80))
    fl = jnp.asarray([16, 12])
    emb = jax.random.normal(jax.random.PRNGKey(3), (2, 192))

    # same data rng components but different dropout keys -> different loss.
    # compute_loss splits rng internally, so compare rate>0 vs rate=0 config
    l1 = float(flow_model.compute_loss(params, cfg, jax.random.PRNGKey(7),
                                       tok, tl, feat, fl, emb))
    import dataclasses
    cfg0 = dataclasses.replace(
        cfg, estimator=dataclasses.replace(cfg.estimator, dropout_rate=0.0))
    l0 = float(flow_model.compute_loss(params, cfg0, jax.random.PRNGKey(7),
                                       tok, tl, feat, fl, emb))
    assert l1 != l0  # dropout changed the estimator output
    # and the dropout-free loss is deterministic
    l0b = float(flow_model.compute_loss(params, cfg0, jax.random.PRNGKey(7),
                                        tok, tl, feat, fl, emb))
    assert l0 == l0b


def test_dit_unrolled_remat_matches_scan_grad(params):
    """The TPU path (unroll=True, dots_saveable remat per block) must match
    the scanned path in forward and gradients, with and without dropout."""
    t_mel = 8
    x = jax.random.normal(jax.random.PRNGKey(20), (1, 80, t_mel))
    mask = jnp.ones((1, 1, t_mel))
    mu = jax.random.normal(jax.random.PRNGKey(21), (1, CFG.input_size, t_mel))
    spks = jax.random.normal(jax.random.PRNGKey(22), (1, 80))
    cond = jnp.zeros((1, 80, t_mel))
    tt = jnp.asarray([0.4])

    for drop_kw in ({}, {"dropout_rng": jax.random.PRNGKey(7), "dropout_rate": 0.1}):
        def loss(p, unroll):
            return jnp.sum(dit.forward(p, CFG.estimator, x, mask, mu, tt,
                                       spks, cond, unroll=unroll, **drop_kw) ** 2)

        f_s, g_s = jax.value_and_grad(lambda p: loss(p, False))(params["estimator"])
        f_u, g_u = jax.value_and_grad(lambda p: loss(p, True))(params["estimator"])
        np.testing.assert_allclose(float(f_u), float(f_s), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)
