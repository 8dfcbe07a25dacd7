"""Flash-batch decode: batched generate parity with per-row generate, and
end-to-end batched synthesis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.models import flow, hift, llm
from flowmirror_hydravox_tpu.ops.sampling import SamplingParams
from flowmirror_hydravox_tpu.runtime.engine import Engine



CFG = tiny_config()


@pytest.fixture(scope="module")
def params():
    return llm.init_params(jax.random.PRNGKey(0), CFG.llm, jnp.float32)


@pytest.mark.quick
def test_generate_batched_rows_independent(params):
    """Each batched row must produce a valid sequence respecting its own
    min/max lengths; rows stop independently."""
    cfg = CFG.llm
    b = 3
    texts = jnp.stack([
        jnp.arange(6, dtype=jnp.int32),
        jnp.arange(6, dtype=jnp.int32) + 5,
        jnp.arange(6, dtype=jnp.int32) + 11,
    ])
    tlens = jnp.asarray([6, 4, 5])
    embs, plens = jax.vmap(
        lambda tt, tl: llm.build_inference_prompt(
            params, cfg, tt, tl, jnp.zeros((0,), jnp.int32), jnp.int32(0)
        )
    )(texts, tlens)
    min_lens = jnp.asarray([4, 2, 30])
    max_lens = jnp.asarray([12, 6, 30])
    res = llm.generate_batched(
        params, cfg, jax.random.PRNGKey(5), embs, plens, min_lens, max_lens,
        SamplingParams.make(), inference_head_num=2, max_tokens=40,
    )
    nums = np.asarray(res.num_tokens)
    toks = np.asarray(res.tokens)
    assert res.tokens.shape == (3, 40)
    for i in range(b):
        assert int(min_lens[i]) <= nums[i] <= int(max_lens[i])
        assert (toks[i, : nums[i]] < cfg.speech_token_size).all()
        assert (toks[i, nums[i]:] == -1).all()


@pytest.mark.quick
def test_generate_batched_single_row_matches_unbatched(params):
    """B=1 batched decode must equal the unbatched loop given the same
    per-step rng stream is derived identically... they split rngs differently
    (per-row split), so compare STRUCTURE: same min/max bounds respected and
    determinism across calls."""
    cfg = CFG.llm
    text = jnp.arange(5, dtype=jnp.int32)
    emb, plen = llm.build_inference_prompt(
        params, cfg, text, jnp.int32(5), jnp.zeros((0,), jnp.int32), jnp.int32(0)
    )
    r1 = llm.generate_batched(
        params, cfg, jax.random.PRNGKey(3), emb[None], plen[None],
        jnp.asarray([4]), jnp.asarray([20]), SamplingParams.make(),
        inference_head_num=2, max_tokens=32,
    )
    r2 = llm.generate_batched(
        params, cfg, jax.random.PRNGKey(3), emb[None], plen[None],
        jnp.asarray([4]), jnp.asarray([20]), SamplingParams.make(),
        inference_head_num=2, max_tokens=32,
    )
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
    assert 4 <= int(r1.num_tokens[0]) <= 20


@pytest.mark.quick
def test_engine_synthesize_batch():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    engine = Engine(
        CFG,
        llm.init_params(k1, CFG.llm, jnp.float32),
        flow.init_params(k2, CFG.flow, jnp.float32),
        hift.init_params(k3, CFG.hift, jnp.float32),
        max_tokens=48,
        prompt_buckets=(32, 64),
        token_buckets=(64, 128),
        mel_buckets=(128, 256),
    )
    texts = [np.arange(6, dtype=np.int32), np.arange(9, dtype=np.int32),
             np.arange(4, dtype=np.int32)]
    wavs, stats = engine.synthesize_batch(
        texts, inference_head_num=2, rng=jax.random.PRNGKey(7),
    )
    spt = CFG.flow.token_mel_ratio * CFG.hift.upsample_scale
    assert len(wavs) == 3
    for w, n in zip(wavs, stats["tokens"]):
        assert len(w) == n * spt
        assert np.isfinite(w).all()
    assert stats["rtf"] > 0


@pytest.mark.quick
def test_fused_batch_matches_two_stage():
    import jax
    import jax.numpy as jnp
    from flowmirror_hydravox_tpu.config import tiny_config
    from flowmirror_hydravox_tpu.models import flow, hift, llm
    from flowmirror_hydravox_tpu.runtime.engine import Engine

    cfg = tiny_config()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = (
        llm.init_params(k1, cfg.llm, jnp.float32),
        flow.init_params(k2, cfg.flow, jnp.float32),
        hift.init_params(k3, cfg.hift, jnp.float32),
    )
    mk = lambda fused: Engine(  # noqa: E731
        cfg, *params, max_tokens=48, prompt_buckets=(32, 64),
        token_buckets=(64, 128), mel_buckets=(128,), fused=fused,
    )
    texts = [np.arange(8, dtype=np.int32), np.arange(12, dtype=np.int32) % 7]
    kwargs = dict(inference_head_num=2, rng=jax.random.PRNGKey(3),
                  min_token_text_ratio=2.0, max_token_text_ratio=3.0)
    wavs_f, stats_f = mk(True).synthesize_batch(texts, **kwargs)
    wavs_t, stats_t = mk(False).synthesize_batch(texts, **kwargs)
    assert stats_f["tokens"] == stats_t["tokens"]
    for a, b in zip(wavs_f, wavs_t):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_engine_synthesize_batch_spec_decode():
    """spec_decode engine: the flash-batch path runs per-row speculative
    verification — valid per-row audio, acceptance surfaced in stats, fused
    and two-stage agree."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = (
        llm.init_params(k1, CFG.llm, jnp.float32),
        flow.init_params(k2, CFG.flow, jnp.float32),
        hift.init_params(k3, CFG.hift, jnp.float32),
    )
    mk = lambda fused: Engine(  # noqa: E731
        CFG, *params, max_tokens=48, prompt_buckets=(32, 64),
        token_buckets=(64, 128), mel_buckets=(128,), fused=fused,
        spec_decode=True,
    )
    texts = [np.arange(8, dtype=np.int32), np.arange(12, dtype=np.int32) % 7]
    kwargs = dict(inference_head_num=3, rng=jax.random.PRNGKey(3),
                  min_token_text_ratio=2.0, max_token_text_ratio=3.0)
    wavs_f, stats_f = mk(True).synthesize_batch(texts, **kwargs)
    wavs_t, stats_t = mk(False).synthesize_batch(texts, **kwargs)
    assert stats_f["tokens"] == stats_t["tokens"]
    assert 0.0 <= stats_f["spec_acceptance"] <= 1.0
    assert stats_f["spec_acceptance"] == stats_t["spec_acceptance"]
    spt = CFG.flow.token_mel_ratio * CFG.hift.upsample_scale
    for w, n in zip(wavs_f, stats_f["tokens"]):
        assert len(w) == n * spt and np.isfinite(w).all()
    for a, b in zip(wavs_f, wavs_t):
        np.testing.assert_allclose(a, b, atol=1.01 / 32767.0)


def test_batched_per_row_zero_shot_prompts():
    """Per-row zero-shot prompts in one flash batch (beyond the reference,
    which serves zero-shot one request per worker): rows are conditioned
    independently — changing row 1's prompt must not change row 0's output
    — and per-row lists equal the shared-prompt form when rows coincide."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = (
        llm.init_params(k1, CFG.llm, jnp.float32),
        flow.init_params(k2, CFG.flow, jnp.float32),
        hift.init_params(k3, CFG.hift, jnp.float32),
    )
    mk = lambda fused=True: Engine(  # noqa: E731
        CFG, *params, max_tokens=48, prompt_buckets=(32, 64),
        token_buckets=(64, 128), mel_buckets=(128,), fused=fused,
    )
    texts = [np.arange(8, dtype=np.int32), np.arange(12, dtype=np.int32) % 7]
    rng_p = np.random.default_rng(0)
    prompt_a = dict(
        tokens=(np.arange(10, dtype=np.int32) * 13) % CFG.llm.speech_token_size,
        mel=rng_p.standard_normal((20, CFG.flow.output_size)).astype(np.float32),
        emb=rng_p.standard_normal(192).astype(np.float32),
    )
    prompt_b = dict(
        tokens=(np.arange(6, dtype=np.int32) * 7 + 3) % CFG.llm.speech_token_size,
        mel=rng_p.standard_normal((12, CFG.flow.output_size)).astype(np.float32),
        emb=rng_p.standard_normal(192).astype(np.float32),
    )
    kwargs = dict(inference_head_num=2, rng=jax.random.PRNGKey(3),
                  min_token_text_ratio=2.0, max_token_text_ratio=3.0)

    eng = mk()
    wav_ab, st_ab = eng.synthesize_batch(
        texts, prompt_speech_tokens=[prompt_a["tokens"], prompt_b["tokens"]],
        prompt_mel=[prompt_a["mel"], prompt_b["mel"]],
        spk_embedding=[prompt_a["emb"], prompt_b["emb"]], **kwargs)
    wav_aa, st_aa = eng.synthesize_batch(
        texts, prompt_speech_tokens=[prompt_a["tokens"], prompt_a["tokens"]],
        prompt_mel=[prompt_a["mel"], prompt_a["mel"]],
        spk_embedding=[prompt_a["emb"], prompt_a["emb"]], **kwargs)
    # row 0 saw identical inputs in both batches -> bit-identical
    assert st_ab["tokens"][0] == st_aa["tokens"][0]
    np.testing.assert_array_equal(wav_ab[0], wav_aa[0])
    # row 1's prompt differs -> its audio must differ
    assert (len(wav_ab[1]) != len(wav_aa[1])
            or not np.array_equal(wav_ab[1], wav_aa[1]))

    # per-row list with identical rows == the shared-prompt argument form
    wav_shared, st_shared = eng.synthesize_batch(
        texts, prompt_speech_tokens=prompt_a["tokens"],
        prompt_mel=prompt_a["mel"], spk_embedding=prompt_a["emb"], **kwargs)
    assert st_shared["tokens"] == st_aa["tokens"]
    for a, b in zip(wav_shared, wav_aa):
        np.testing.assert_array_equal(a, b)

    # fused and two-stage agree on per-row prompts
    wav_t, st_t = mk(False).synthesize_batch(
        texts, prompt_speech_tokens=[prompt_a["tokens"], prompt_b["tokens"]],
        prompt_mel=[prompt_a["mel"], prompt_b["mel"]],
        spk_embedding=[prompt_a["emb"], prompt_b["emb"]], **kwargs)
    assert st_t["tokens"] == st_ab["tokens"]
    for a, b in zip(wav_t, wav_ab):
        np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.quick
def test_synth_group_planner():
    """The grouped-synth planner only uses warm shapes, prefers tight
    grouping when it saves padded frames, and declines when the plain
    dispatch is optimal or nothing is warm."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    eng = Engine(
        CFG,
        llm.init_params(k1, CFG.llm, jnp.float32),
        flow.init_params(k2, CFG.flow, jnp.float32),
        hift.init_params(k3, CFG.hift, jnp.float32),
        max_tokens=48, prompt_buckets=(32, 64),
        token_buckets=(64, 128), mel_buckets=(128,),
        synth_buckets=(16, 32, 64, 128),
    )
    eng._GROUP_DISPATCH_OVERHEAD = 0  # tiny buckets: isolate the shape logic
    n_alls = np.asarray([8, 7, 24, 30])

    # nothing warm -> no plan (the plain dispatch compiles as before)
    assert eng._plan_synth_groups(n_alls, 0, 0) is None

    # warm: short pair fits (2, 16), long pair (2, 32); full batch (4, 32)
    eng.register_warm_batch_synth(2, 16, 0, 0)
    eng.register_warm_batch_synth(2, 32, 0, 0)
    eng.register_warm_batch_synth(4, 32, 0, 0)
    plan = eng._plan_synth_groups(n_alls, 0, 0)
    # 2x16 + 2x32 = 96 beats 4x32 = 128
    assert plan is not None and len(plan) == 2
    (rows_a, b_a, t_a), (rows_b, b_b, t_b) = plan
    assert sorted(rows_a) == [0, 1] and (b_a, t_a) == (2, 16)
    assert sorted(rows_b) == [2, 3] and (b_b, t_b) == (2, 32)

    # rows all long -> single-group plan equals the plain dispatch -> None
    assert eng._plan_synth_groups(np.asarray([24, 30, 28, 25]), 0, 0) is None

    # strict (serving) mode: a warm plan must win over a COLD plain dispatch
    # even when its padded cost is higher — all rows land in bucket 64 but
    # only (4, 128) is warm
    eng._warm_group_shapes = {(4, 128, 0, 0)}
    eng.strict_shapes = True
    plan = eng._plan_synth_groups(np.asarray([40, 50, 60, 33]), 0, 0)
    assert plan == [(tuple(int(i) for i in np.argsort([40, 50, 60, 33])), 4, 128)]

    # offline mode (strict off): the one-time compile amortizes — prefer the
    # tight base bucket and let it self-warm
    eng.strict_shapes = False
    assert eng._plan_synth_groups(np.asarray([40, 50, 60, 33]), 0, 0) is None

    # prompt-bucket mismatch filters warm shapes out
    assert eng._plan_synth_groups(np.asarray([40, 50, 60, 33]), 128, 0) is None


def test_grouped_batch_synth_end_to_end():
    """4 rows with disparate lengths route through two synth groups; audio
    lengths and token counts match the plain path's accounting."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = (
        llm.init_params(k1, CFG.llm, jnp.float32),
        flow.init_params(k2, CFG.flow, jnp.float32),
        hift.init_params(k3, CFG.hift, jnp.float32),
    )
    mk = lambda: Engine(  # noqa: E731
        CFG, *params, max_tokens=48, prompt_buckets=(32, 64),
        token_buckets=(64, 128), mel_buckets=(128,),
        synth_buckets=(16, 32, 64, 128), fused=False,
    )
    texts = [np.arange(4, dtype=np.int32), np.arange(4, dtype=np.int32) + 1,
             np.arange(12, dtype=np.int32), np.arange(12, dtype=np.int32) % 5]
    kwargs = dict(inference_head_num=2, rng=jax.random.PRNGKey(3),
                  min_token_text_ratio=2.0, max_token_text_ratio=2.0)

    base = mk()
    wavs_plain, st_plain = base.synthesize_batch(texts, **kwargs)
    assert "synth_groups" not in st_plain  # nothing warm on first contact

    grp = mk()
    grp._GROUP_DISPATCH_OVERHEAD = 0
    grp.register_warm_batch_synth(2, 16, 0, 0)
    grp.register_warm_batch_synth(2, 32, 0, 0)
    wavs_g, st_g = grp.synthesize_batch(texts, **kwargs)
    assert st_g.get("synth_groups") is not None and len(st_g["synth_groups"]) == 2
    # decode is identical regardless of synth grouping
    assert st_g["tokens"] == st_plain["tokens"]
    spt = CFG.flow.token_mel_ratio * CFG.hift.upsample_scale
    for w, n in zip(wavs_g, st_g["tokens"]):
        assert len(w) == n * spt
        assert np.isfinite(w).all()
