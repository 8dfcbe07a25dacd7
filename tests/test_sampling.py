"""RAS sampling semantics vs a numpy oracle of the reference algorithm
(cosyvoice/utils/common.py:138-166)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from flowmirror_hydravox_tpu.ops.sampling import (
    SamplingParams,
    nucleus_sample,
    ras_dist,
    ras_sample,
    sample_dist,
)

pytestmark = pytest.mark.quick



def oracle_nucleus_set(probs, top_p, top_k):
    """The reference's nucleus membership: iterate sorted probs, include while
    cum(previous) < top_p and count < top_k."""
    order = np.argsort(-probs, kind="stable")
    kept, cum = [], 0.0
    for idx in order:
        if cum < top_p and len(kept) < top_k:
            cum += probs[idx]
            kept.append(idx)
        else:
            break
    return set(kept)


def test_nucleus_set_membership():
    rng = np.random.default_rng(0)
    for trial in range(5):
        logits = rng.standard_normal(40).astype(np.float32) * 2.0
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        kept = oracle_nucleus_set(probs, 0.8, 10)
        draws = set()
        for i in range(300):
            tok = int(nucleus_sample(jax.random.PRNGKey(trial * 1000 + i),
                                     jnp.asarray(logits), 0.8, 10))
            draws.add(tok)
        assert draws.issubset(kept), f"sampled outside nucleus: {draws - kept}"
        # high-probability members should appear
        best = max(kept, key=lambda i: probs[i])
        assert best in draws


def test_nucleus_peaked_is_deterministic():
    logits = jnp.zeros(20).at[7].set(50.0)
    for i in range(10):
        assert int(nucleus_sample(jax.random.PRNGKey(i), logits, 0.8, 25)) == 7


def test_ignore_eos_masks_stop_tokens():
    sts = 10  # speech_token_size; ids >= 10 are stop ids
    logits = jnp.zeros(15).at[12].set(50.0).at[3].set(10.0)
    params = SamplingParams.make()
    hist = jnp.full((32,), -1, jnp.int32)
    for i in range(10):
        tok = int(
            ras_sample(jax.random.PRNGKey(i), logits, hist, jnp.int32(0), params,
                       jnp.bool_(True), sts)
        )
        assert tok < sts
    # without ignore_eos the stop token wins
    tok = int(
        ras_sample(jax.random.PRNGKey(0), logits, hist, jnp.int32(0), params,
                   jnp.bool_(False), sts)
    )
    assert tok == 12


def test_repetition_fallback_triggers():
    """A candidate repeated >= win_size*tau_r times in the window must divert
    to plain multinomial over the full distribution."""
    sts = 100
    # token 5 moderately dominant: nucleus-with-top_k=1 always picks it, but
    # the full softmax gives other ids ~65% total mass
    logits = jnp.zeros(100).at[5].set(4.0)
    params = SamplingParams.make(top_p=0.8, top_k=1, win_size=10, tau_r=0.1)
    hist = jnp.full((64,), -1, jnp.int32).at[jnp.arange(10)].set(5)  # 10x token 5
    num = jnp.int32(10)
    draws = [
        int(ras_sample(jax.random.PRNGKey(i), logits, hist, num, params,
                       jnp.bool_(False), sts))
        for i in range(40)
    ]
    assert any(d != 5 for d in draws)

    # with no repetition history, top_k=1 nucleus always returns token 5
    hist0 = jnp.full((64,), -1, jnp.int32)
    draws0 = {
        int(ras_sample(jax.random.PRNGKey(i), logits, hist0, jnp.int32(0), params,
                       jnp.bool_(False), sts))
        for i in range(20)
    }
    assert draws0 == {5}


def test_ras_dist_matches_empirical_sampler():
    """ras_dist is the exact marginal of ras_sample — compare against the
    empirical frequency of many draws in a regime that exercises all three
    terms (nucleus truncation, eos mask, repetition fallback)."""
    sts = 12  # ids 12..15 are stop ids
    v = 16
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal(v).astype(np.float32) * 2.0)
    params = SamplingParams.make(top_p=0.8, top_k=4, win_size=6, tau_r=0.3)
    # repeat the argmax enough to trigger the fallback path for it
    top = int(jnp.argmax(logits))
    hist = jnp.full((32,), -1, jnp.int32).at[jnp.arange(4)].set(top)
    num = jnp.int32(4)

    for ignore_eos in (False, True):
        dist = np.asarray(
            ras_dist(logits, hist, num, params, jnp.bool_(ignore_eos), sts)
        )
        assert dist.shape == (v,)
        np.testing.assert_allclose(dist.sum(), 1.0, atol=1e-5)
        if ignore_eos:
            assert (dist[sts:] == 0).all()

        n = 8000
        draws = jax.vmap(
            lambda r: ras_sample(r, logits, hist, num, params,
                                 jnp.bool_(ignore_eos), sts)
        )(jax.random.split(jax.random.PRNGKey(0), n))
        freq = np.bincount(np.asarray(draws), minlength=v) / n
        np.testing.assert_allclose(freq, dist, atol=0.02)

        # sample_dist draws the same distribution
        draws2 = jax.vmap(lambda r: sample_dist(r, jnp.asarray(dist)))(
            jax.random.split(jax.random.PRNGKey(1), n)
        )
        freq2 = np.bincount(np.asarray(draws2), minlength=v) / n
        np.testing.assert_allclose(freq2, dist, atol=0.02)


def test_ras_dist_no_fallback_is_pure_nucleus():
    """With nothing repeated, ras_dist must equal the renormalized nucleus
    distribution: zero outside the kept set, probs/Z inside."""
    v = 20
    logits = jnp.asarray(np.linspace(3.0, -3.0, v).astype(np.float32))
    params = SamplingParams.make(top_p=0.5, top_k=8, win_size=10, tau_r=0.5)
    hist = jnp.full((16,), -1, jnp.int32)
    dist = np.asarray(ras_dist(logits, hist, jnp.int32(0), params,
                               jnp.bool_(False), v))
    probs = np.asarray(jax.nn.softmax(logits))
    # oracle kept set (reference membership rule)
    kept = sorted(oracle_nucleus_set(probs, 0.5, 8))
    z = probs[kept].sum()
    expect = np.zeros(v)
    expect[kept] = probs[kept] / z
    np.testing.assert_allclose(dist, expect, atol=1e-6)
