"""DPO loss/forward + bistream sequence construction + bistream inference."""

import jax
import jax.numpy as jnp
import numpy as np

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.models import llm, llm_extras
from flowmirror_hydravox_tpu.models.llm import IGNORE_ID

CFG = tiny_config().llm


def test_dpo_loss_prefers_chosen():
    good = jnp.asarray([0.0, 0.0])
    bad = jnp.asarray([-2.0, -2.0])
    ref = jnp.asarray([-1.0, -1.0])
    loss_aligned, cr, rr = llm_extras.dpo_loss(good, bad, ref, ref)
    loss_reversed, _, _ = llm_extras.dpo_loss(bad, good, ref, ref)
    assert float(loss_aligned) < float(loss_reversed)
    assert (np.asarray(cr) > np.asarray(rr)).all()
    # ipo variant finite
    loss_ipo, _, _ = llm_extras.dpo_loss(good, bad, ref, ref, ipo=True)
    assert np.isfinite(float(loss_ipo))


def test_forward_dpo_shapes():
    params = llm.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    rng = jax.random.PRNGKey(1)
    text = jax.random.randint(rng, (2, 5), 0, 200)
    chosen = jax.random.randint(rng, (2, 8), 0, CFG.speech_token_size)
    rejected = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 0, CFG.speech_token_size)
    out = llm_extras.forward_dpo(
        params, CFG, text, jnp.asarray([5, 4]), chosen, jnp.asarray([8, 7]),
        rejected, jnp.asarray([6, 5]),
    )
    assert out["chosen_logps"].shape == (2,)
    assert out["rejected_logps"].shape == (2,)
    assert np.isfinite(float(out["loss"]))
    # identical chosen/rejected -> identical logps
    out2 = llm_extras.forward_dpo(
        params, CFG, text, jnp.asarray([5, 4]), chosen, jnp.asarray([8, 7]),
        chosen, jnp.asarray([8, 7]),
    )
    np.testing.assert_allclose(
        np.asarray(out2["chosen_logps"]), np.asarray(out2["rejected_logps"]), atol=1e-5
    )


def test_bistream_sequence_layout():
    """mix_ratio (5, 15): full chunks emit 4 IGNOREs + 15 speech + fill;
    the tail emits remaining text + task + remaining speech + eos."""
    cfg = CFG
    text = np.arange(7)  # 5 + 2 tail
    speech = np.arange(40) % cfg.speech_token_size  # 15 + 25 tail
    plan, targets = llm_extras.build_bistream_sequence(text, speech, cfg)
    assert len(plan) == len(targets)
    assert plan[0][0] == "sos"
    # first full chunk: 5 text then 15 speech
    kinds = [k for k, _ in plan]
    assert kinds[1:6] == ["text"] * 5
    assert kinds[6:21] == ["speech"] * 15
    # fill token after first chunk's speech targets
    assert targets[20] == cfg.fill_token
    # tail has task marker then remaining speech, ends with eos
    assert "task" in kinds
    assert targets[-1] == cfg.eos_token or IGNORE_ID not in (targets[-1],)


def test_inference_bistream_runs():
    params = llm.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)

    def chunks():
        for i in range(4):
            yield np.arange(3, dtype=np.int32) + i

    toks = list(
        llm_extras.inference_bistream(
            params, CFG, jax.random.PRNGKey(3), chunks(),
            prompt_text=np.asarray([1, 2], np.int32),
            prompt_speech_token=np.zeros((0,), np.int32),
            max_tokens=48, cache_len_cap=256,
        )
    )
    assert all(0 <= t < CFG.speech_token_size for t in toks)
