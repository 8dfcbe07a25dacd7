"""MTP LM: head parity vs torch Qwen2DecoderLayer, loss/target construction,
and the KV-cached group-decode loop vs a naive full-recompute reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.models import llm, qwen2
from flowmirror_hydravox_tpu.ops.sampling import SamplingParams

CFG = tiny_config().llm


@pytest.fixture(scope="module")
def params():
    return llm.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)


def test_mtp_head_matches_torch_decoder_layer():
    """The reduced pointwise head must equal a full Qwen2DecoderLayer applied
    to a length-1 sequence (llm_multi_head_v3.py:886-887)."""
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config as HFConfig
    from transformers.models.qwen2.modeling_qwen2 import Qwen2DecoderLayer, Qwen2RotaryEmbedding

    h, heads = 64, 4
    hf_cfg = HFConfig(
        hidden_size=h, num_attention_heads=heads, num_key_value_heads=heads,
        intermediate_size=96, attn_implementation="eager",
    )
    torch.manual_seed(0)
    layer = Qwen2DecoderLayer(hf_cfg, 0).eval()
    rot = Qwen2RotaryEmbedding(hf_cfg)

    x = torch.randn(3, 1, h) * 0.2
    with torch.no_grad():
        pos = torch.zeros(3, 1, dtype=torch.long)
        pe = rot(x, pos)
        ref = layer(x, position_embeddings=pe)
        if isinstance(ref, tuple):
            ref = ref[0]
    ref = ref.numpy()[:, 0]

    sd = {k: v.detach().numpy() for k, v in layer.state_dict().items()}
    head = {
        "input_layernorm": sd["input_layernorm.weight"],
        "v_proj_w": sd["self_attn.v_proj.weight"].T,
        "v_proj_b": sd["self_attn.v_proj.bias"],
        "o_proj_w": sd["self_attn.o_proj.weight"].T,
        "post_attention_layernorm": sd["post_attention_layernorm.weight"],
        "gate_proj_w": sd["mlp.gate_proj.weight"].T,
        "up_proj_w": sd["mlp.up_proj.weight"].T,
        "down_proj_w": sd["mlp.down_proj.weight"].T,
    }
    head = jax.tree.map(jnp.asarray, head)
    ours = np.asarray(llm._mtp_head_apply(head, jnp.asarray(x.numpy()[:, 0]), 1e-6))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-4)


def test_lm_targets_match_reference_layout():
    """Targets per head k: IGNORE*(1+tlen) ++ speech[k:slen] ++ eos ++ IGNORE*k
    (llm_multi_head_v3.py:749-762)."""
    speech = jnp.asarray([[7, 8, 9, 10, 0]])  # slen=4 (last is pad)
    tgt = llm.build_lm_targets(CFG, jnp.asarray([2]), speech, jnp.asarray([4]), t_total=9)
    eos = CFG.eos_token
    I = llm.IGNORE_ID
    # head 0: [I, I, I, 7, 8, 9, 10, eos, I]
    np.testing.assert_array_equal(np.asarray(tgt[0, 0]), [I, I, I, 7, 8, 9, 10, eos, I])
    # head 1: [I, I, I, 8, 9, 10, eos, I, I]
    np.testing.assert_array_equal(np.asarray(tgt[1, 0]), [I, I, I, 8, 9, 10, eos, I, I])
    # head 2: [I, I, I, 9, 10, eos, I, I, I]
    np.testing.assert_array_equal(np.asarray(tgt[2, 0]), [I, I, I, 9, 10, eos, I, I, I])


def test_lm_input_layout(params):
    """Input: [sos, text_emb, task, speech_emb], eos-padded."""
    text = jnp.asarray([[3, 4, 0]])
    speech = jnp.asarray([[11, 12]])
    inp, lens = llm.build_lm_input(params, CFG, text, jnp.asarray([2]), speech, jnp.asarray([2]))
    assert inp.shape == (1, 7, CFG.backbone.hidden_size)
    assert int(lens[0]) == 6
    se = params["speech_embedding"]
    np.testing.assert_allclose(np.asarray(inp[0, 0]), np.asarray(se[CFG.sos]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(inp[0, 1]), np.asarray(params["backbone"]["embed_tokens"][3]), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(inp[0, 3]), np.asarray(se[CFG.task_id]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(inp[0, 4]), np.asarray(se[11]), rtol=1e-6)
    # pad position = eos embedding
    np.testing.assert_allclose(np.asarray(inp[0, 6]), np.asarray(se[CFG.eos_token]), rtol=1e-6)


def test_forward_loss_finite(params):
    rng = jax.random.PRNGKey(1)
    tt = jax.random.randint(rng, (2, 6), 0, 200)
    st = jax.random.randint(rng, (2, 12), 0, CFG.speech_token_size)
    out = llm.forward_loss(params, CFG, tt, jnp.asarray([6, 4]), st, jnp.asarray([12, 9]))
    assert np.isfinite(float(out["loss"]))
    assert 0.0 <= float(out["acc"]) <= 1.0


def test_forward_loss_fused_ce_matches_log_softmax(params):
    """forward_loss computes CE via the fused logsumexp identity (memory
    optimization); it must equal the naive log_softmax formulation."""
    rng = jax.random.PRNGKey(3)
    tt = jax.random.randint(rng, (2, 6), 0, 200)
    tl, sl = jnp.asarray([6, 4]), jnp.asarray([12, 9])
    st = jax.random.randint(rng, (2, 12), 0, CFG.speech_token_size)
    out = llm.forward_loss(params, CFG, tt, tl, st, sl)

    # naive re-computation from the same logits/targets
    inp, lm_len = llm.build_lm_input(params, CFG, tt, tl, st, sl)
    hidden = llm.qwen2.forward(params["backbone"], CFG.backbone, inp, lm_len)
    logits = llm.mtp_logits(params, CFG, hidden, CFG.head_num)
    targets = llm.build_lm_targets(CFG, tl, st, sl, inp.shape[1])
    valid = targets != llm.IGNORE_ID
    tgt = jnp.clip(targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    if CFG.lsm_weight > 0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - CFG.lsm_weight) * nll + CFG.lsm_weight * smooth
    denom = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1)
    if not CFG.length_normalized_loss:
        denom = jnp.full_like(denom, targets.shape[1])
    naive = float(jnp.mean(jnp.sum(jnp.where(valid, nll, 0.0), axis=(1, 2)) / denom))
    np.testing.assert_allclose(float(out["loss"]), naive, rtol=1e-5)


def _naive_group_decode(params, cfg, rng, prompt_embeds, prompt_len, min_len, max_len, head_k):
    """Reference-shaped decode: full-prefix recompute each step, no cache
    (llm_multi_head_v3.py:871-922) — the oracle for the KV-cached loop."""
    from flowmirror_hydravox_tpu.ops.sampling import ras_sample_heads

    sampling = SamplingParams.make()
    prefix = prompt_embeds[: int(prompt_len)]
    out_tokens = []
    hist = jnp.full((max_len + head_k,), -1, jnp.int32)
    while len(out_tokens) < max_len:
        rng, step_rng = jax.random.split(rng)
        hidden = qwen2.forward(params["backbone"], cfg.backbone, prefix[None])
        last = hidden[0, -1]
        logits = llm.mtp_logits(params, cfg, last, head_k)
        sampled = ras_sample_heads(
            step_rng, logits, hist, jnp.int32(len(out_tokens)), sampling,
            jnp.int32(min_len), cfg.speech_token_size,
        )
        sampled = np.asarray(sampled)
        stop = False
        group = []
        for tid in sampled:
            if tid >= cfg.speech_token_size:
                stop = True
                break
            out_tokens.append(int(tid))
            group.append(int(tid))
            hist = hist.at[len(out_tokens) - 1].set(int(tid))
            if len(out_tokens) >= max_len:
                stop = True
                break
        if stop or not group:
            break
        emb = jnp.take(params["speech_embedding"], jnp.asarray(sampled), axis=0)
        prefix = jnp.concatenate([prefix, emb], axis=0)
    return out_tokens


def test_generate_matches_naive_recompute(params):
    """Same RNG stream -> the cached loop must emit the identical token
    sequence as full-prefix recompute (validates cache + mask + sampling)."""
    rng = jax.random.PRNGKey(7)
    text = jax.random.randint(jax.random.PRNGKey(3), (5,), 0, 200)
    emb, plen = llm.build_inference_prompt(
        params, CFG, text, jnp.int32(5), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    head_k = 2
    naive = _naive_group_decode(params, CFG, rng, emb, int(plen), 3, 30, head_k)
    res = llm.generate(
        params, CFG, rng, emb, plen, jnp.int32(3), jnp.int32(30),
        SamplingParams.make(), inference_head_num=head_k, max_tokens=40,
    )
    got = list(np.asarray(res.tokens[: int(res.num_tokens)]))
    assert got == naive, f"cached={got} naive={naive}"
    assert len(got) <= 30


def test_speculative_greedy_matches_heads1(params):
    """Deterministic sampling (top_k=1 nucleus, tau_r>1 so the repetition
    fallback never fires): generate_speculative must emit the bit-identical
    token sequence to sequential heads=1 decoding regardless of draft quality
    — the speculative accept/reject is exact at every position."""
    det = SamplingParams.make(top_p=0.5, top_k=1, win_size=10, tau_r=2.0)
    text = jax.random.randint(jax.random.PRNGKey(5), (6,), 0, 200)
    emb, plen = llm.build_inference_prompt(
        params, CFG, text, jnp.int32(6), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    base = llm.generate(
        params, CFG, jax.random.PRNGKey(1), emb, plen, jnp.int32(4), jnp.int32(24),
        det, inference_head_num=1, max_tokens=32,
    )
    spec = llm.generate_speculative(
        params, CFG, jax.random.PRNGKey(2), emb, plen, jnp.int32(4), jnp.int32(24),
        det, num_heads=3, max_tokens=32,
    )
    got_base = list(np.asarray(base.tokens[: int(base.num_tokens)]))
    got_spec = list(np.asarray(spec.result.tokens[: int(spec.result.num_tokens)]))
    assert got_base == got_spec, f"base={got_base} spec={got_spec}"
    assert len(got_base) >= 4
    # speculation never takes more backbone forwards than sequential decode
    assert int(spec.result.steps) <= int(base.steps) + 1
    assert int(spec.drafted) == int(spec.result.steps) * 2  # K-1 = 2 per step


def test_speculative_stochastic_contract(params):
    """RAS sampling on: emitted ids are valid speech tokens, min/max length
    respected, acceptance bookkeeping consistent."""
    text = jax.random.randint(jax.random.PRNGKey(9), (4,), 0, 200)
    emb, plen = llm.build_inference_prompt(
        params, CFG, text, jnp.int32(4), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    spec = llm.generate_speculative(
        params, CFG, jax.random.PRNGKey(3), emb, plen, jnp.int32(8), jnp.int32(20),
        SamplingParams.make(), num_heads=3, max_tokens=32,
    )
    n = int(spec.result.num_tokens)
    assert 8 <= n <= 20
    toks = np.asarray(spec.result.tokens[:n])
    assert (toks >= 0).all() and (toks < CFG.speech_token_size).all()
    assert 0 <= int(spec.accepted) <= int(spec.drafted)


def test_speculative_distribution_matches_heads1(params):
    """Statistical check of the exactness theorem under full RAS sampling:
    the marginal distribution of the token at position 1 (the first position
    that exercises draft verification) must match sequential heads=1 decoding.
    2000 seeds each; total-variation distance bounded by sampling noise."""
    text = jax.random.randint(jax.random.PRNGKey(5), (4,), 0, 200)
    emb, plen = llm.build_inference_prompt(
        params, CFG, text, jnp.int32(4), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    n = 2000
    sampling = SamplingParams.make()

    base_fn = jax.jit(jax.vmap(lambda r: llm.generate(
        params, CFG, r, emb, plen, jnp.int32(2), jnp.int32(4),
        sampling, inference_head_num=1, max_tokens=8, cache_len_cap=256,
    ).tokens[1]))
    spec_fn = jax.jit(jax.vmap(lambda r: llm.generate_speculative(
        params, CFG, r, emb, plen, jnp.int32(2), jnp.int32(4),
        sampling, num_heads=3, max_tokens=8, cache_len_cap=256,
    ).result.tokens[1]))

    seeds = jax.random.split(jax.random.PRNGKey(0), n)
    t_base = np.asarray(base_fn(seeds))
    t_spec = np.asarray(spec_fn(jax.random.split(jax.random.PRNGKey(1), n)))
    v = CFG.vocab_size
    f_base = np.bincount(t_base, minlength=v) / n
    f_spec = np.bincount(t_spec, minlength=v) / n
    tv = 0.5 * np.abs(f_base - f_spec).sum()
    assert tv < 0.12, f"TV distance {tv:.3f} between spec and heads=1 marginals"


def test_batched_speculative_greedy_matches_solo(params):
    """Flash-batch speculative decode, deterministic sampling: every row must
    emit exactly the solo speculative (== heads=1) sequence for its prompt —
    per-row cache lengths and the vmapped verify keep rows independent."""
    det = SamplingParams.make(top_p=0.5, top_k=1, win_size=10, tau_r=2.0)
    texts = [
        jax.random.randint(jax.random.PRNGKey(s), (6,), 0, 200) for s in (5, 17, 29)
    ]
    embs, plens = [], []
    for t in texts:
        e, p = llm.build_inference_prompt(
            params, CFG, t, jnp.int32(6), jnp.zeros((0,), jnp.int32), jnp.int32(0)
        )
        embs.append(e)
        plens.append(p)
    batch = llm.generate_batched_speculative(
        params, CFG, jax.random.PRNGKey(1), jnp.stack(embs),
        jnp.stack(plens), jnp.full((3,), 4, jnp.int32),
        jnp.asarray([24, 17, 24], jnp.int32),  # row 1 gets a tighter budget
        det, num_heads=3, max_tokens=32,
    )
    assert int(batch.drafted) >= int(batch.accepted) >= 0
    for i in range(3):
        solo = llm.generate_speculative(
            params, CFG, jax.random.PRNGKey(2), embs[i], plens[i],
            jnp.int32(4), jnp.int32([24, 17, 24][i]), det, num_heads=3,
            max_tokens=32,
        )
        want = list(np.asarray(solo.result.tokens[: int(solo.result.num_tokens)]))
        got = list(np.asarray(batch.result.tokens[i][: int(batch.result.num_tokens[i])]))
        assert got == want, f"row {i}: batch={got} solo={want}"


def test_speculative_zero_budget_commits_nothing(params):
    """max_len=0 (empty tts text): spec paths must emit zero tokens like the
    blind paths — the first pend must not leak past the budget."""
    text = jax.random.randint(jax.random.PRNGKey(3), (4,), 0, 200)
    emb, plen = llm.build_inference_prompt(
        params, CFG, text, jnp.int32(4), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    solo = llm.generate_speculative(
        params, CFG, jax.random.PRNGKey(0), emb, plen, jnp.int32(0),
        jnp.int32(0), SamplingParams.make(), num_heads=3, max_tokens=16,
    )
    assert int(solo.result.num_tokens) == 0
    batch = llm.generate_batched_speculative(
        params, CFG, jax.random.PRNGKey(0), emb[None], plen[None],
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        SamplingParams.make(), num_heads=3, max_tokens=16,
    )
    assert int(batch.result.num_tokens[0]) == 0


def test_batched_speculative_stochastic_contract(params):
    text = jax.random.randint(jax.random.PRNGKey(3), (4,), 0, 200)
    emb, plen = llm.build_inference_prompt(
        params, CFG, text, jnp.int32(4), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    b = 4
    spec = llm.generate_batched_speculative(
        params, CFG, jax.random.PRNGKey(0),
        jnp.broadcast_to(emb, (b, *emb.shape)), jnp.full((b,), plen),
        jnp.full((b,), 6, jnp.int32), jnp.full((b,), 20, jnp.int32),
        SamplingParams.make(), num_heads=3, max_tokens=32,
    )
    nums = np.asarray(spec.result.num_tokens)
    assert ((nums >= 6) & (nums <= 20)).all()
    toks = np.asarray(spec.result.tokens)
    for i in range(b):
        row = toks[i, : nums[i]]
        assert (row >= 0).all() and (row < CFG.speech_token_size).all()
    # same rng for every identical row would be wrong — rows draw their own
    assert len({tuple(toks[i, : nums[i]]) for i in range(b)}) > 1


def test_speculative_joint_sequence_distribution_matches(params):
    """Stronger than the position-1 marginal check: the JOINT distribution
    over whole 3-token sequences must match sequential heads=1 decoding
    (the spec theorem composes per-position exactness through the sampled
    prefix).  top_k=3 keeps the support small enough to estimate."""
    sp = SamplingParams.make(top_p=1.0, top_k=3, win_size=10, tau_r=2.0)
    text = jax.random.randint(jax.random.PRNGKey(5), (4,), 0, 200)
    emb, plen = llm.build_inference_prompt(
        params, CFG, text, jnp.int32(4), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    n, v = 3000, CFG.vocab_size

    base_fn = jax.jit(jax.vmap(lambda r: llm.generate(
        params, CFG, r, emb, plen, jnp.int32(3), jnp.int32(3),
        sp, inference_head_num=1, max_tokens=8, cache_len_cap=256,
    ).tokens[:3]))
    spec_fn = jax.jit(jax.vmap(lambda r: llm.generate_speculative(
        params, CFG, r, emb, plen, jnp.int32(3), jnp.int32(3),
        sp, num_heads=3, max_tokens=8, cache_len_cap=256,
    ).result.tokens[:3]))

    t_base = np.asarray(base_fn(jax.random.split(jax.random.PRNGKey(0), n)))
    t_spec = np.asarray(spec_fn(jax.random.split(jax.random.PRNGKey(1), n)))
    assert (t_base >= 0).all() and (t_spec >= 0).all()  # all runs hit 3 tokens

    from collections import Counter
    c_base = Counter(map(tuple, t_base))
    c_spec = Counter(map(tuple, t_spec))
    keys = set(c_base) | set(c_spec)
    assert len(keys) <= 3 ** 3 + 10  # top_k=3 per step bounds the support
    tv = 0.5 * sum(abs(c_base.get(k, 0) - c_spec.get(k, 0)) for k in keys) / n
    assert tv < 0.12, f"joint TV distance {tv:.3f}"


def test_speculative_acceptance_rises_with_training():
    """Evidence for the spec-decode design claim: MTP heads trained on the
    standard multi-head CE (head k predicts position +k — exactly the draft
    skill) push draft acceptance up.  Train a tiny model on a deterministic
    cyclic token pattern and compare acceptance before vs after under
    deterministic sampling; untrained acceptance is near-chance while the
    trained model's drafts track the learned pattern."""
    from flowmirror_hydravox_tpu.train.steps import (
        OptimConfig, init_state, llm_train_step, make_optimizer,
    )

    sts = CFG.speech_token_size
    params0 = llm.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    det = SamplingParams.make(top_p=0.5, top_k=1, win_size=10, tau_r=2.0)
    text = jnp.zeros((2,), jnp.int32)
    emb, plen = llm.build_inference_prompt(
        params0, CFG, text, jnp.int32(2), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )

    def acceptance(p):
        spec = llm.generate_speculative(
            p, CFG, jax.random.PRNGKey(1), emb, plen, jnp.int32(24),
            jnp.int32(24), det, num_heads=3, max_tokens=32,
        )
        return float(spec.accepted) / max(float(spec.drafted), 1.0)

    acc_before = acceptance(params0)

    # corpus: speech_token[t] = (start + t) % sts — next-token and
    # next-next-token are pure offsets, learnable by heads 0..2
    b, ls = 8, 24
    rng = np.random.default_rng(0)
    opt = make_optimizer(OptimConfig(learning_rate=3e-3, warmup_steps=5,
                                     total_steps=200, schedule="constant"))
    state = init_state(params0, opt)
    step = jax.jit(lambda s, bt: llm_train_step(s, bt, CFG, opt))
    for i in range(120):
        starts = rng.integers(0, sts, (b, 1))
        batch = {
            "text_token": np.zeros((b, 2), np.int32),
            "text_len": np.full((b,), 2, np.int32),
            "speech_token": ((starts + np.arange(ls)[None, :]) % sts).astype(np.int32),
            "speech_len": np.full((b,), ls, np.int32),
        }
        state, metrics = step(state, jax.tree.map(jnp.asarray, batch))
    assert float(metrics["acc"]) > 0.9, "tiny model failed to learn the cycle"

    acc_after = acceptance(state.params)
    # untrained: drafts are arbitrary argmaxes (~1/sts chance); trained: the
    # heads predict the learned cycle so most drafts verify
    assert acc_after > max(0.5, acc_before + 0.3), (
        f"acceptance before={acc_before:.2f} after={acc_after:.2f}"
    )


def test_generate_respects_min_len(params):
    """With ignore_eos active below min_len, at least min_len tokens emerge."""
    rng = jax.random.PRNGKey(11)
    text = jax.random.randint(rng, (4,), 0, 200)
    emb, plen = llm.build_inference_prompt(
        params, CFG, text, jnp.int32(4), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    res = llm.generate(
        params, CFG, rng, emb, plen, jnp.int32(8), jnp.int32(20),
        SamplingParams.make(), inference_head_num=2, max_tokens=32,
    )
    assert int(res.num_tokens) >= 8
    toks = np.asarray(res.tokens[: int(res.num_tokens)])
    assert (toks < CFG.speech_token_size).all()
