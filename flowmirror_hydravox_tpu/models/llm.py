"""CosyVoice3-style multi-head (MTP) speech-token LM — TPU-native.

Reimplements the semantics of reference `CosyVoice3LM`
(llm_multi_head_v3.py:622-960) with a TPU-first design:

  - Decode uses a real KV cache (`models/qwen2.py`) with a fixed K-token block
    per step, where K = inference_head_num.  The reference re-encodes the full
    prefix every step with `cache=None` (llm_multi_head_v3.py:873-882, O(L^2)
    per step); semantics are preserved (heads sample against the same history
    snapshot; generation stops at the first stop-token inside a group) while
    cost drops to O(L) per step.
  - The decode loop is a bounded `lax.while_loop` over a preallocated token
    buffer: one jit compilation covers every utterance length.
  - MTP heads: the reference applies a full `Qwen2DecoderLayer` to a length-1
    sequence (llm_multi_head_v3.py:886-887): RoPE at position 0 is identity
    and softmax over a single key is 1, so the layer reduces exactly to
        h = x + o_proj(v_proj(rms_1(x)))
        y = h + mlp(rms_2(h))
    We implement that reduced form (bit-equivalent, ~2/3 the FLOPs since
    q/k projections are dead).  q/k weights are kept in the param tree for
    checkpoint compatibility.  Training uses the same per-position semantics
    (equivalent to the reference's seq-transposed call at micro-batch 1, the
    configuration its DeepSpeed trainer asserts).
  - Sampling (RAS + stop-token semantics) runs on-device (ops/sampling.py).

Special ids (llm_multi_head_v3.py:643-683): sos=S, eos=S+1, task=S+2,
fill=S+3, stop ids = S..S+199, vocab = S+200, with S = speech_token_size.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LLMConfig
from ..ops.quant import matmul_q
from ..ops.sampling import SamplingParams, ras_dist, ras_sample_heads, sample_dist
from . import qwen2

IGNORE_ID = -1


# ---------------------------------------------------------------------------
# Parameters


def init_params(rng: jax.Array, cfg: LLMConfig, dtype=jnp.bfloat16) -> dict:
    k_backbone, k_dec, k_emb, k_mtp = jax.random.split(rng, 4)
    h = cfg.backbone.hidden_size
    vocab = cfg.vocab_size

    def w(key, *shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

    # each MTP head is one Qwen2 decoder layer (hidden h, mtp_head_num heads,
    # HF-default intermediate 22016 — add_mtp_weights_to_cosyvoice3lm_ckpt.py:133)
    mtp_inter = 22016
    nh = cfg.head_num
    qd = h  # mtp_head_num * (h // mtp_head_num) == h
    keys = jax.random.split(k_mtp, 8)
    mtp = {
        "input_layernorm": jnp.ones((nh, h), dtype),
        "q_proj_w": w(keys[0], nh, h, qd),
        "q_proj_b": jnp.zeros((nh, qd), dtype),
        "k_proj_w": w(keys[1], nh, h, qd),
        "k_proj_b": jnp.zeros((nh, qd), dtype),
        "v_proj_w": w(keys[2], nh, h, qd),
        "v_proj_b": jnp.zeros((nh, qd), dtype),
        "o_proj_w": w(keys[3], nh, qd, h),
        "post_attention_layernorm": jnp.ones((nh, h), dtype),
        "gate_proj_w": w(keys[4], nh, h, mtp_inter),
        "up_proj_w": w(keys[5], nh, h, mtp_inter),
        "down_proj_w": w(keys[6], nh, mtp_inter, h),
    }
    return {
        "backbone": qwen2.init_params(k_backbone, cfg.backbone, dtype),
        "llm_decoder": w(k_dec, h, vocab),  # Linear no-bias (llm_multi_head_v3.py:652)
        "speech_embedding": w(k_emb, vocab, h),
        "mtp_block": mtp,
    }


# ---------------------------------------------------------------------------
# MTP heads (reduced length-1 decoder-layer form — see module docstring)


def _mtp_head_apply(head: dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Single head, pointwise. x: (..., H) -> (..., H)."""
    attn_in = qwen2._rms_norm(x, head["input_layernorm"], eps)
    v = matmul_q(attn_in, head, "v_proj_w") + head["v_proj_b"]
    x = x + matmul_q(v, head, "o_proj_w")
    mlp_in = qwen2._rms_norm(x, head["post_attention_layernorm"], eps)
    gate = jax.nn.silu(matmul_q(mlp_in, head, "gate_proj_w"))
    return x + matmul_q(gate * matmul_q(mlp_in, head, "up_proj_w"), head, "down_proj_w")


def mtp_logits(params: dict, cfg: LLMConfig, hidden: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Apply heads 0..num_heads-1 and the shared decoder.

    hidden: (..., H) -> logits (num_heads, ..., vocab).

    Unrolled per-head loop with static indexing, NOT `vmap(heads[:k])`: the
    sliced-stack vmap form made XLA materialize a copy of the (5, 22016, 896)
    head weight stacks INSIDE the decode while-loop — ~23% of the int8 decode
    step went to s8 copy-start/copy-done ops (xplane profile, v5e, 2026-08).
    Static `a[k]` reads fuse into each head's matmuls with no copy."""
    eps = cfg.backbone.rms_norm_eps
    outs = [
        _mtp_head_apply(jax.tree.map(lambda a: a[k], params["mtp_block"]), hidden, eps)
        for k in range(num_heads)
    ]
    out = jnp.stack(outs)
    return matmul_q(out, params, "llm_decoder").astype(jnp.float32)


# ---------------------------------------------------------------------------
# Training: input/target construction + multi-head CE loss


def build_lm_input(
    params: dict,
    cfg: LLMConfig,
    text_token: jnp.ndarray,  # (B, Lt) int32, right-padded
    text_len: jnp.ndarray,  # (B,)
    speech_token: jnp.ndarray,  # (B, Ls) int32, right-padded
    speech_len: jnp.ndarray,  # (B,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble [sos, text_emb, task, speech_emb] per sample, padded with the
    eos embedding row (llm_multi_head_v3.py:723-747). Returns
    (lm_input (B, T, H), lm_input_len (B,)) with T = 2 + Lt + Ls."""
    b, lt = text_token.shape
    ls = speech_token.shape[1]
    t_total = 2 + lt + ls
    h = cfg.backbone.hidden_size

    text_emb = qwen2.embed_tokens(params["backbone"], jnp.clip(text_token, 0))
    speech_emb = jnp.take(
        params["speech_embedding"],
        jnp.clip(speech_token, 0, params["speech_embedding"].shape[0] - 1), axis=0,
    )
    sos = params["speech_embedding"][cfg.sos]
    task = params["speech_embedding"][cfg.task_id]
    eos = params["speech_embedding"][cfg.eos_token]

    pos = jnp.arange(t_total)

    def assemble(txt_e, spc_e, tlen, slen):
        # region selectors per output position
        text_idx = jnp.clip(pos - 1, 0, lt - 1)
        speech_idx = jnp.clip(pos - tlen - 2, 0, ls - 1)
        gathered_text = txt_e[text_idx]
        gathered_speech = spc_e[speech_idx]
        out = jnp.where(
            (pos == 0)[:, None], sos[None, :],
            jnp.where(
                ((pos >= 1) & (pos <= tlen))[:, None], gathered_text,
                jnp.where(
                    (pos == tlen + 1)[:, None], task[None, :],
                    jnp.where(
                        ((pos >= tlen + 2) & (pos < tlen + 2 + slen))[:, None],
                        gathered_speech,
                        eos[None, :],
                    ),
                ),
            ),
        )
        return out.astype(jnp.asarray(txt_e).dtype).reshape(t_total, h)

    lm_input = jax.vmap(assemble)(text_emb, speech_emb, text_len, speech_len)
    return lm_input, 2 + text_len + speech_len


def build_lm_targets(
    cfg: LLMConfig,
    text_len: jnp.ndarray,  # (B,)
    speech_token: jnp.ndarray,  # (B, Ls)
    speech_len: jnp.ndarray,  # (B,)
    t_total: int,
) -> jnp.ndarray:
    """Per-head shifted targets (llm_multi_head_v3.py:749-762): head k at
    position p predicts speech token p-(1+tlen)+k, with one eos after the
    last speech target and IGNORE elsewhere.  Returns (head_num, B, T)."""
    ls = speech_token.shape[1]
    pos = jnp.arange(t_total)

    def per_head(k):
        def per_sample(spc, tlen, slen):
            sidx = pos - (1 + tlen) + k
            in_speech = (pos >= 1 + tlen) & (sidx < slen)
            is_eos = pos == (1 + tlen) + (slen - k)
            tok = spc[jnp.clip(sidx, 0, ls - 1)]
            return jnp.where(in_speech, tok, jnp.where(is_eos, cfg.eos_token, IGNORE_ID))

        return jax.vmap(per_sample)(speech_token, text_len, speech_len)

    return jnp.stack([per_head(k) for k in range(cfg.head_num)])


def forward_loss(
    params: dict,
    cfg: LLMConfig,
    text_token: jnp.ndarray,
    text_len: jnp.ndarray,
    speech_token: jnp.ndarray,
    speech_len: jnp.ndarray,
    backbone_forward=None,
) -> dict:
    """Training loss: mean over heads of label-smoothed CE on shifted targets
    (llm_multi_head_v3.py:766-828). Returns {'loss', 'acc'}.

    `backbone_forward(params, cfg, embeds, lengths)` overrides the stock
    full-sequence forward — used by parallel/pipeline.py to run the layer
    stack GPipe-pipelined over a 'stage' mesh axis."""
    if backbone_forward is None:
        backbone_forward = qwen2.forward
    lm_input, lm_len = build_lm_input(params, cfg, text_token, text_len, speech_token, speech_len)
    t_total = lm_input.shape[1]
    hidden = backbone_forward(params["backbone"], cfg.backbone, lm_input, lm_len)
    logits = mtp_logits(params, cfg, hidden, cfg.head_num)  # (K, B, T, V)
    targets = build_lm_targets(cfg, text_len, speech_token, speech_len, t_total)  # (K, B, T)

    valid = targets != IGNORE_ID
    tgt = jnp.clip(targets, 0)
    # fused CE: log_softmax[t] = logits[t] - logsumexp, so
    #   nll    = lse - logits[tgt]
    #   smooth = -mean(log_softmax) = lse - mean(logits)
    # This keeps only (K,B,T)-shaped intermediates live for the backward
    # (logsumexp's VJP recomputes the softmax) instead of materializing the
    # full (K,B,T,V) log-prob tensor — the CE was ~HBM-bound at vocab 6761.
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    logit_tgt = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0]
    nll = lse - logit_tgt
    if cfg.lsm_weight > 0:
        # KL(uniform-smoothed || pred) as in WeNet LabelSmoothingLoss
        smooth = lse - jnp.mean(logits, axis=-1)
        nll = (1.0 - cfg.lsm_weight) * nll + cfg.lsm_weight * smooth
    denom = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1)  # per-head token count
    if not cfg.length_normalized_loss:
        denom = jnp.full_like(denom, targets.shape[1])
    per_head_loss = jnp.sum(jnp.where(valid, nll, 0.0), axis=(1, 2)) / denom
    pred = jnp.argmax(logits, axis=-1)
    per_head_acc = jnp.sum(jnp.where(valid, pred == tgt, False), axis=(1, 2)) / denom
    return {"loss": jnp.mean(per_head_loss), "acc": jnp.mean(per_head_acc)}


# ---------------------------------------------------------------------------
# Inference: KV-cached multi-head group decode


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray  # (max_tokens,) int32, valid prefix only
    num_tokens: jnp.ndarray  # scalar int32
    steps: jnp.ndarray  # scalar int32 — base-LLM forward count (for TPS metrics)


class SpecResult(NamedTuple):
    result: GenerateResult
    accepted: jnp.ndarray  # scalar int32 — drafts accepted by the verifier
    drafted: jnp.ndarray  # scalar int32 — drafts proposed (acceptance = a/d)


def build_inference_prompt(
    params: dict,
    cfg: LLMConfig,
    text_token: jnp.ndarray,  # (Lt,) prompt_text + tts_text tokens
    text_len: jnp.ndarray,  # scalar
    prompt_speech_token: jnp.ndarray,  # (Lp,) may be zero-length logically
    prompt_speech_len: jnp.ndarray,  # scalar
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[sos, text_emb, task, prompt_speech_emb] (llm_multi_head_v3.py:941-952).
    Static shape (1 + Lt + 1 + Lp, H); returns (embeds, true_len)."""
    lt = text_token.shape[0]
    lp = prompt_speech_token.shape[0]
    t_total = 2 + lt + lp
    text_emb = qwen2.embed_tokens(params["backbone"], jnp.clip(text_token, 0))
    speech_emb = jnp.take(
        params["speech_embedding"],
        jnp.clip(prompt_speech_token, 0, params["speech_embedding"].shape[0] - 1), axis=0,
    )
    sos = params["speech_embedding"][cfg.sos]
    task = params["speech_embedding"][cfg.task_id]

    pos = jnp.arange(t_total)
    tlen = text_len
    text_idx = jnp.clip(pos - 1, 0, lt - 1)
    speech_idx = jnp.clip(pos - tlen - 2, 0, max(lp - 1, 0))
    out = jnp.where(
        (pos == 0)[:, None], sos[None, :],
        jnp.where(
            ((pos >= 1) & (pos <= tlen))[:, None], text_emb[text_idx],
            jnp.where(
                (pos == tlen + 1)[:, None], task[None, :],
                speech_emb[speech_idx] if lp > 0 else jnp.zeros_like(sos)[None, :],
            ),
        ),
    )
    return out.astype(text_emb.dtype), 2 + tlen + prompt_speech_len


def init_generate_state(
    params: dict,
    cfg: LLMConfig,
    rng: jax.Array,
    prompt_embeds: jnp.ndarray,  # (T_prompt, H) padded; true length below
    prompt_len: jnp.ndarray,  # scalar int32
    *,
    inference_head_num: int,
    max_tokens: int = 1024,
    cache_len_cap: Optional[int] = None,
) -> dict:
    """Prefill the KV cache and build the decode-loop carry state.

    The state is a pure pytree, so incremental decoding (streaming) can call
    `generate_until` repeatedly with donated state — the cache stays
    device-resident between chunks."""
    head_k = max(1, min(int(inference_head_num), cfg.head_num))
    t_prompt, _ = prompt_embeds.shape
    if cache_len_cap is None:
        cache_len_cap = t_prompt + max_tokens + head_k
    # round up to a multiple of 256: Pallas flash-decode blocks and XLA tiling
    # both want block-aligned cache lengths; extra rows are masked out
    cache_len_cap = -(-cache_len_cap // 256) * 256
    bb = cfg.backbone

    cache = qwen2.init_kv_cache(bb, 1, cache_len_cap, dtype=prompt_embeds.dtype)
    hidden, cache = qwen2.forward_block_with_cache(
        params["backbone"], bb, prompt_embeds[None], cache, advance=prompt_len[None]
    )
    return dict(
        rng=rng,
        cache=cache,
        last_hidden=hidden[0, prompt_len - 1],
        tokens=jnp.full((max_tokens + head_k,), -1, jnp.int32),
        num=jnp.int32(0),
        steps=jnp.int32(0),
        finished=jnp.bool_(False),
    )


def generate_until(
    params: dict,
    cfg: LLMConfig,
    state: dict,
    target_num: jnp.ndarray,  # scalar int32 — run until num >= target or done
    min_len: jnp.ndarray,
    max_len: jnp.ndarray,
    sampling: SamplingParams,
    *,
    inference_head_num: int,
) -> dict:
    """Run group-decode steps until `target_num` tokens are available or
    generation finishes.  Pass target_num == max_len for one-shot decoding;
    smaller targets give streaming chunks."""
    head_k = max(1, min(int(inference_head_num), cfg.head_num))
    bb = cfg.backbone
    emb_dtype = params["speech_embedding"].dtype
    # slice the head stack to the active heads once, outside the loop —
    # otherwise every step streams the unused heads' weights from HBM too
    params = dict(
        params, mtp_block=jax.tree.map(lambda a: a[:head_k], params["mtp_block"])
    )

    def cond(s):
        return (~s["finished"]) & (s["num"] < target_num)

    def body(s):
        rng, rng_step = jax.random.split(s["rng"])
        logits = mtp_logits(params, cfg, s["last_hidden"], head_k)  # (K, V)
        sampled = ras_sample_heads(
            rng_step, logits, s["tokens"], s["num"], sampling, min_len, cfg.speech_token_size
        )  # (K,)
        is_stop = sampled >= cfg.speech_token_size
        # tokens before the first stop id
        before_stop = jnp.cumsum(is_stop) == 0  # (K,) True until first stop
        n_ok = jnp.sum(before_stop).astype(jnp.int32)
        budget = jnp.maximum(max_len - s["num"], 0)
        n_accept = jnp.minimum(n_ok, budget)

        # write accepted ids into the buffer at [num, num+n_accept)
        write_pos = s["num"] + jnp.arange(head_k)
        accept_mask = jnp.arange(head_k) < n_accept
        tokens = s["tokens"].at[write_pos].set(
            jnp.where(accept_mask, sampled, s["tokens"][write_pos])
        )
        num = s["num"] + n_accept
        finished = jnp.any(is_stop) | (num >= max_len) | (n_accept == 0)

        def continue_fn(cache):
            emb = jnp.take(params["speech_embedding"], sampled, axis=0).astype(emb_dtype)
            hidden, cache = qwen2.forward_block_with_cache(
                params["backbone"], bb, emb[None], cache,
                advance=jnp.full((1,), head_k, jnp.int32),
            )
            return hidden[0, head_k - 1], cache

        def stop_fn(cache):
            return s["last_hidden"], cache

        last_hidden, cache = jax.lax.cond(finished, stop_fn, continue_fn, s["cache"])
        return dict(
            rng=rng, cache=cache, last_hidden=last_hidden, tokens=tokens,
            num=num, steps=s["steps"] + 1, finished=finished,
        )

    return jax.lax.while_loop(cond, body, state)


def generate_batched(
    params: dict,
    cfg: LLMConfig,
    rng: jax.Array,
    prompt_embeds: jnp.ndarray,  # (B, T_prompt, H) padded
    prompt_len: jnp.ndarray,  # (B,)
    min_len: jnp.ndarray,  # (B,)
    max_len: jnp.ndarray,  # (B,)
    sampling: SamplingParams,
    *,
    inference_head_num: int,
    max_tokens: int = 1024,
    cache_len_cap: Optional[int] = None,
) -> GenerateResult:
    """Batched multi-head decode — the "flash batch" serving mode: several
    independent utterances (e.g. segments of one long text) decode in one
    device program, sharing each weight read across the batch.  Per-row
    stop/length bookkeeping; the loop runs until every row finishes.

    Returns GenerateResult with tokens (B, max_tokens) and num_tokens (B,)."""
    head_k = max(1, min(int(inference_head_num), cfg.head_num))
    b, t_prompt, h = prompt_embeds.shape
    if cache_len_cap is None:
        cache_len_cap = t_prompt + max_tokens + head_k
    cache_len_cap = -(-cache_len_cap // 256) * 256
    bb = cfg.backbone
    # stream only the active heads' weights per step (see generate_until)
    params = dict(
        params, mtp_block=jax.tree.map(lambda a: a[:head_k], params["mtp_block"])
    )

    cache = qwen2.init_kv_cache(bb, b, cache_len_cap, dtype=prompt_embeds.dtype)
    hidden, cache = qwen2.forward_block_with_cache(
        params["backbone"], bb, prompt_embeds, cache, advance=prompt_len
    )
    last_hidden = jnp.take_along_axis(
        hidden, (prompt_len - 1)[:, None, None], axis=1
    )[:, 0]  # (B, H)

    state = dict(
        rng=rng,
        cache=cache,
        last_hidden=last_hidden,
        tokens=jnp.full((b, max_tokens + head_k), -1, jnp.int32),
        num=jnp.zeros((b,), jnp.int32),
        steps=jnp.int32(0),
        finished=jnp.zeros((b,), bool),
    )

    def cond(s):
        return ~jnp.all(s["finished"])

    def body(s):
        rng, rng_step = jax.random.split(s["rng"])
        logits = mtp_logits(params, cfg, s["last_hidden"], head_k)  # (K, B, V)
        row_rngs = jax.random.split(rng_step, b)
        sampled = jax.vmap(
            lambda r, lg, hist, n, mn: ras_sample_heads(
                r, lg, hist, n, sampling, mn, cfg.speech_token_size
            ),
            in_axes=(0, 1, 0, 0, 0),
        )(row_rngs, logits, s["tokens"], s["num"], min_len)  # (B, K)

        is_stop = sampled >= cfg.speech_token_size
        before_stop = jnp.cumsum(is_stop, axis=1) == 0  # (B, K)
        n_ok = jnp.sum(before_stop, axis=1).astype(jnp.int32)
        budget = jnp.maximum(max_len - s["num"], 0)
        n_accept = jnp.where(s["finished"], 0, jnp.minimum(n_ok, budget))

        write_pos = s["num"][:, None] + jnp.arange(head_k)[None, :]  # (B, K)
        accept = jnp.arange(head_k)[None, :] < n_accept[:, None]
        cur = jnp.take_along_axis(s["tokens"], write_pos, axis=1)
        tokens = jax.vmap(lambda row, idx, val: row.at[idx].set(val))(
            s["tokens"], write_pos, jnp.where(accept, sampled, cur)
        )
        num = s["num"] + n_accept
        finished = s["finished"] | jnp.any(is_stop, axis=1) | (num >= max_len) | (n_accept == 0)

        emb = jnp.take(params["speech_embedding"], sampled, axis=0).astype(prompt_embeds.dtype)
        hidden, cache = qwen2.forward_block_with_cache(
            params["backbone"], bb, emb, s["cache"],
            advance=jnp.where(finished, 0, head_k).astype(jnp.int32),
        )
        last_hidden = jnp.where(
            finished[:, None], s["last_hidden"], hidden[:, head_k - 1]
        )
        return dict(
            rng=rng, cache=cache, last_hidden=last_hidden, tokens=tokens,
            num=num, steps=s["steps"] + 1, finished=finished,
        )

    final = jax.lax.while_loop(cond, body, state)
    return GenerateResult(
        tokens=final["tokens"][:, :max_tokens], num_tokens=final["num"], steps=final["steps"]
    )


def init_spec_state(
    params: dict,
    cfg: LLMConfig,
    rng: jax.Array,
    prompt_embeds: jnp.ndarray,  # (T_prompt, H) padded; true length below
    prompt_len: jnp.ndarray,  # scalar int32
    min_len: jnp.ndarray,  # scalar int32
    max_len: jnp.ndarray,  # scalar int32
    sampling: SamplingParams,
    *,
    num_heads: int,
    max_tokens: int = 1024,
    cache_len_cap: Optional[int] = None,
) -> dict:
    """Prefill + first pending token for speculative decoding (the spec
    counterpart of init_generate_state; same resumable-pytree contract, so
    streaming can pause/resume at chunk targets with the cache device-
    resident).  The first token is sampled from head 0 on the prompt hidden
    — the exact heads=1 distribution."""
    head_k = max(2, min(int(num_heads), cfg.head_num))
    t_prompt, _ = prompt_embeds.shape
    if cache_len_cap is None:
        cache_len_cap = t_prompt + max_tokens + head_k
    cache_len_cap = -(-cache_len_cap // 256) * 256
    bb = cfg.backbone
    sts = cfg.speech_token_size
    p_tgt = dict(params, mtp_block=jax.tree.map(lambda a: a[:1], params["mtp_block"]))

    cache = qwen2.init_kv_cache(bb, 1, cache_len_cap, dtype=prompt_embeds.dtype)
    hidden, cache = qwen2.forward_block_with_cache(
        params["backbone"], bb, prompt_embeds[None], cache, advance=prompt_len[None]
    )
    h0 = hidden[0, prompt_len - 1]

    rng, r0 = jax.random.split(rng)
    buf = jnp.full((max_tokens + head_k,), -1, jnp.int32)
    q0 = ras_dist(
        mtp_logits(p_tgt, cfg, h0, 1)[0], buf, jnp.int32(0), sampling,
        jnp.int32(0) < min_len, sts,
    )
    t0 = sample_dist(r0, q0)
    # a zero-length budget commits nothing (matches the blind paths and the
    # batched spec init, where max_len < 1 folds into the stop condition)
    stop0 = (t0 >= sts) | (max_len < 1)
    return dict(
        rng=rng,
        cache=cache,
        last_hidden=h0,
        pend=t0,
        tokens=jnp.where(stop0, buf, buf.at[0].set(t0)),
        num=jnp.where(stop0, 0, 1).astype(jnp.int32),
        steps=jnp.int32(0),
        accepted=jnp.int32(0),  # accepted draft count (acceptance-rate metric)
        drafted=jnp.int32(0),
        finished=stop0,
    )


def _spec_draft_row(rng, draft_logits, buf, num, sampling, min_len, sts):
    """Per-row draft sampling with explicit distributions.  draft_logits:
    (kd, V) from heads 1..K-1 on the last cached hidden.  Returns
    (drafts (kd,), p_dists (kd, V), buf_d with drafts tentatively written)."""
    kd = draft_logits.shape[0]
    counts = num + jnp.arange(kd)  # tokens decoded before each draft position
    p_dists = jax.vmap(
        lambda lg, c: ras_dist(lg, buf, num, sampling, c < min_len, sts)
    )(draft_logits, counts)
    drafts = jax.vmap(sample_dist)(jax.random.split(rng, kd), p_dists)
    buf_d = buf.at[num + jnp.arange(kd)].set(drafts)
    return drafts, p_dists, buf_d


def _spec_verify_row(r_acc, r_res, r_bonus, tgt_logits, drafts, p_dists, buf_d,
                     num, min_len, max_len, sampling, sts):
    """Per-row speculative accept/reject + emission bookkeeping (shared by
    the solo and flash-batch loops; vmap over rows for the latter).

    tgt_logits: (K, V) = head 0 on each in-block hidden.  Returns
    (e (K,) emitted tokens, n_emit, n_commit, n_acc, finished)."""
    kd = drafts.shape[0]
    head_k = kd + 1
    counts = num + jnp.arange(kd)
    q_dists = jax.vmap(
        lambda lg, c: ras_dist(lg, buf_d, c, sampling, c < min_len, sts)
    )(tgt_logits[:kd], counts)
    u = jax.random.uniform(r_acc, (kd,))
    p_d = jnp.take_along_axis(p_dists, drafts[:, None], axis=1)[:, 0]
    q_d = jnp.take_along_axis(q_dists, drafts[:, None], axis=1)[:, 0]
    accept = u * p_d < q_d  # u < q/p without the divide
    n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32))).astype(jnp.int32)
    all_acc = n_acc == kd

    # rejected position: resample from the normalized residual max(q-p,0)
    j = jnp.minimum(n_acc, kd - 1)
    res = jnp.maximum(q_dists[j] - p_dists[j], 0.0)
    z = jnp.sum(res)
    r_tok = sample_dist(r_res, jnp.where(z > 1e-12, res / z, q_dists[j]))
    # bonus token when every draft holds: head0 on the last block hidden
    q_bonus = ras_dist(
        tgt_logits[kd], buf_d, num + kd, sampling, (num + kd) < min_len, sts
    )
    b_tok = sample_dist(r_bonus, q_bonus)

    # emitted this step: accepted drafts, then r (reject) or bonus (all-acc)
    e = jnp.concatenate([drafts, b_tok[None]])  # (K,)
    e = e.at[j + jnp.where(all_acc, 1, 0)].set(jnp.where(all_acc, b_tok, r_tok))
    n_emit = jnp.where(all_acc, head_k, n_acc + 1)

    # stop/budget bookkeeping (same contract as generate_until)
    arange_k = jnp.arange(head_k)
    valid = arange_k < n_emit
    stop_seen = (e >= sts) & valid
    before_stop = jnp.cumsum(stop_seen) == 0
    n_ok = jnp.sum(before_stop & valid).astype(jnp.int32)
    budget = jnp.maximum(max_len - num, 0)
    n_commit = jnp.minimum(n_ok, budget)
    finished = jnp.any(stop_seen) | (num + n_commit >= max_len)
    return e, n_emit, n_commit, n_acc, finished


def generate_spec_until(
    params: dict,
    cfg: LLMConfig,
    state: dict,
    target_num: jnp.ndarray,  # scalar int32 — run until num >= target or done
    min_len: jnp.ndarray,
    max_len: jnp.ndarray,
    sampling: SamplingParams,
    *,
    num_heads: int,
) -> dict:
    """Speculative decode loop (see generate_speculative).  Like
    generate_until, runs until `target_num` tokens are available or
    generation finishes — pass target_num == max_len for one-shot decoding,
    smaller targets for streaming chunks (pausing does not change the rng
    stream, so chunked output equals one-shot output token-for-token).
    """
    head_k = max(2, min(int(num_heads), cfg.head_num))
    bb = cfg.backbone
    emb_dtype = params["speech_embedding"].dtype
    sts = cfg.speech_token_size
    # stream only the needed head weights per step (see generate_until)
    p_tgt = dict(params, mtp_block=jax.tree.map(lambda a: a[:1], params["mtp_block"]))
    p_draft = dict(
        params, mtp_block=jax.tree.map(lambda a: a[1:head_k], params["mtp_block"])
    )
    kd = head_k - 1  # number of drafts per step

    def cond(s):
        return (~s["finished"]) & (s["num"] < target_num)

    def body(s):
        rng, r_draft, r_acc, r_res, r_bonus = jax.random.split(s["rng"], 5)
        num, buf = s["num"], s["tokens"]

        # --- draft: heads 1..K-1 on the last cached hidden, explicit dists
        draft_logits = mtp_logits(p_draft, cfg, s["last_hidden"], kd)  # (kd, V)
        drafts, p_dists, buf_d = _spec_draft_row(
            r_draft, draft_logits, buf, num, sampling, min_len, sts
        )

        # --- one backbone forward over [pend, drafts]; cache rows written at
        # [len, len+K), length bumped after verification
        block = jnp.concatenate([s["pend"][None], drafts])
        emb = jnp.take(params["speech_embedding"], block, axis=0).astype(emb_dtype)
        hidden_blk, cache_w = qwen2.forward_block_with_cache(
            params["backbone"], bb, emb[None], s["cache"],
            advance=jnp.zeros((1,), jnp.int32),
        )
        hs = hidden_blk[0]  # (K, H): hs[i] = hidden after block[0..i]

        # --- verify: target = head0 on each in-block hidden (exact heads=1)
        tgt_logits = mtp_logits(p_tgt, cfg, hs, 1)[0]  # (K, V)
        e, n_emit, n_commit, n_acc, finished = _spec_verify_row(
            r_acc, r_res, r_bonus, tgt_logits, drafts, p_dists, buf_d,
            num, min_len, max_len, sampling, sts,
        )

        arange_k = jnp.arange(head_k)
        wpos = num + arange_k
        wmask = arange_k < n_commit
        tokens = buf.at[wpos].set(jnp.where(wmask, e, buf[wpos]))
        # cache keeps [pend, accepted drafts] = n_emit rows; the new pend
        # (r or bonus) stays cache-pending for the next block
        cache = qwen2.KVCache(
            k=cache_w.k, v=cache_w.v, length=s["cache"].length + n_emit
        )
        return dict(
            rng=rng, cache=cache,
            last_hidden=hs[n_emit - 1],
            pend=e[n_emit - 1],
            tokens=tokens, num=num + n_commit,
            steps=s["steps"] + 1,
            accepted=s["accepted"] + n_acc,
            drafted=s["drafted"] + kd,
            finished=finished,
        )

    return jax.lax.while_loop(cond, body, state)


def generate_batched_speculative(
    params: dict,
    cfg: LLMConfig,
    rng: jax.Array,
    prompt_embeds: jnp.ndarray,  # (B, T_prompt, H) padded
    prompt_len: jnp.ndarray,  # (B,)
    min_len: jnp.ndarray,  # (B,)
    max_len: jnp.ndarray,  # (B,)
    sampling: SamplingParams,
    *,
    num_heads: int,
    max_tokens: int = 1024,
    cache_len_cap: Optional[int] = None,
) -> "SpecResult":
    """Flash-batch speculative decode: every row drafts with heads 1..K-1 and
    verifies against head 0 independently (the per-row math is the solo
    loop's `_spec_draft_row`/`_spec_verify_row`, vmapped), sharing each
    weight read across the batch like generate_batched.  Rows commit 1..K
    tokens per block forward and desynchronize in emitted count; per-row
    cache lengths absorb that (`forward_block_with_cache` advance is (B,)).
    Emitted sequences are per-row exact heads=1 distributions — greedy mode
    is bit-identical to solo decoding of each row.

    Returns SpecResult whose .result carries (B, max_tokens) tokens and (B,)
    num_tokens; accepted/drafted sum over rows for the batch acceptance rate.
    """
    head_k = max(2, min(int(num_heads), cfg.head_num))
    b, t_prompt, h = prompt_embeds.shape
    if cache_len_cap is None:
        cache_len_cap = t_prompt + max_tokens + head_k
    cache_len_cap = -(-cache_len_cap // 256) * 256
    bb = cfg.backbone
    emb_dtype = params["speech_embedding"].dtype
    sts = cfg.speech_token_size
    p_tgt = dict(params, mtp_block=jax.tree.map(lambda a: a[:1], params["mtp_block"]))
    p_draft = dict(
        params, mtp_block=jax.tree.map(lambda a: a[1:head_k], params["mtp_block"])
    )
    kd = head_k - 1

    cache = qwen2.init_kv_cache(bb, b, cache_len_cap, dtype=prompt_embeds.dtype)
    hidden, cache = qwen2.forward_block_with_cache(
        params["backbone"], bb, prompt_embeds, cache, advance=prompt_len
    )
    last_hidden = jnp.take_along_axis(
        hidden, (prompt_len - 1)[:, None, None], axis=1
    )[:, 0]  # (B, H)

    # first pending token per row ~ exact heads=1 distribution
    rng, r0 = jax.random.split(rng)
    buf = jnp.full((b, max_tokens + head_k), -1, jnp.int32)
    q0 = jax.vmap(
        lambda lg, hist, mn: ras_dist(
            lg, hist, jnp.int32(0), sampling, jnp.int32(0) < mn, sts
        )
    )(mtp_logits(p_tgt, cfg, last_hidden, 1)[0], buf, min_len)  # (B, V)
    t0 = jax.vmap(sample_dist)(jax.random.split(r0, b), q0)  # (B,)
    stop0 = (t0 >= sts) | (max_len < 1)
    buf = jnp.where(stop0[:, None], buf, buf.at[:, 0].set(t0))

    state = dict(
        rng=rng,
        cache=cache,
        last_hidden=last_hidden,
        pend=t0,
        tokens=buf,
        num=jnp.where(stop0, 0, 1).astype(jnp.int32),
        steps=jnp.int32(0),
        accepted=jnp.int32(0),
        drafted=jnp.int32(0),
        finished=stop0,
    )

    def cond(s):
        return ~jnp.all(s["finished"])

    def body(s):
        rng, r_draft, r_acc, r_res, r_bonus = jax.random.split(s["rng"], 5)
        num, buf = s["num"], s["tokens"]
        active = ~s["finished"]

        draft_logits = mtp_logits(p_draft, cfg, s["last_hidden"], kd)  # (kd, B, V)
        drafts, p_dists, buf_d = jax.vmap(
            lambda r, lg, hist, n, mn: _spec_draft_row(
                r, lg, hist, n, sampling, mn, sts
            )
        )(
            jax.random.split(r_draft, b), jnp.swapaxes(draft_logits, 0, 1),
            buf, num, min_len,
        )  # (B, kd), (B, kd, V), (B, L)

        block = jnp.concatenate([s["pend"][:, None], drafts], axis=1)  # (B, K)
        emb = jnp.take(params["speech_embedding"], block, axis=0).astype(emb_dtype)
        hidden_blk, cache_w = qwen2.forward_block_with_cache(
            params["backbone"], bb, emb, s["cache"],
            advance=jnp.zeros((b,), jnp.int32),
        )  # (B, K, H)

        tgt_logits = mtp_logits(p_tgt, cfg, hidden_blk, 1)[0]  # (B, K, V)
        e, n_emit, n_commit, n_acc, fin_row = jax.vmap(
            lambda ra, rr, rb, tl, d, pd, bd, n, mn, mx: _spec_verify_row(
                ra, rr, rb, tl, d, pd, bd, n, mn, mx, sampling, sts
            )
        )(
            jax.random.split(r_acc, b), jax.random.split(r_res, b),
            jax.random.split(r_bonus, b), tgt_logits, drafts, p_dists, buf_d,
            num, min_len, max_len,
        )  # (B, K), (B,), (B,), (B,), (B,)

        n_emit = jnp.where(active, n_emit, 0)
        n_commit = jnp.where(active, n_commit, 0)
        finished = s["finished"] | (active & fin_row)

        arange_k = jnp.arange(head_k)
        wpos = num[:, None] + arange_k[None, :]  # (B, K)
        wmask = arange_k[None, :] < n_commit[:, None]
        cur = jnp.take_along_axis(buf, wpos, axis=1)
        tokens = jax.vmap(lambda row, idx, val: row.at[idx].set(val))(
            buf, wpos, jnp.where(wmask, e, cur)
        )
        cache = qwen2.KVCache(
            k=cache_w.k, v=cache_w.v, length=s["cache"].length + n_emit
        )
        idx_last = jnp.maximum(n_emit - 1, 0)
        h_next = jnp.take_along_axis(
            hidden_blk, idx_last[:, None, None], axis=1
        )[:, 0]
        last_hidden = jnp.where(active[:, None], h_next, s["last_hidden"])
        pend = jnp.where(
            active, jnp.take_along_axis(e, idx_last[:, None], axis=1)[:, 0],
            s["pend"],
        )
        return dict(
            rng=rng, cache=cache, last_hidden=last_hidden, pend=pend,
            tokens=tokens, num=num + n_commit,
            steps=s["steps"] + 1,
            accepted=s["accepted"] + jnp.sum(jnp.where(active, n_acc, 0)),
            drafted=s["drafted"] + jnp.sum(jnp.where(active, kd, 0)),
            finished=finished,
        )

    final = jax.lax.while_loop(cond, body, state)
    return SpecResult(
        result=GenerateResult(
            tokens=final["tokens"][:, :max_tokens],
            num_tokens=final["num"],
            steps=final["steps"],
        ),
        accepted=final["accepted"],
        drafted=final["drafted"],
    )


def generate_speculative(
    params: dict,
    cfg: LLMConfig,
    rng: jax.Array,
    prompt_embeds: jnp.ndarray,  # (T_prompt, H) padded; true length below
    prompt_len: jnp.ndarray,  # scalar int32
    min_len: jnp.ndarray,  # scalar int32
    max_len: jnp.ndarray,  # scalar int32
    sampling: SamplingParams,
    *,
    num_heads: int,
    max_tokens: int = 1024,
    cache_len_cap: Optional[int] = None,
) -> "SpecResult":
    """Self-speculative MTP decode: heads=1 output distribution at near
    multi-head speed.

    The reference's MTP mode (llm_multi_head_v3.py:861-922) commits every
    head's sample blindly, trading quality for K tokens/step.  This mode
    instead uses heads 1..K-1 as *draft* proposals for the next K-1
    positions and verifies them against head 0 — the sequential heads=1
    distribution — with one KV-cached backbone forward over the K-token
    block (speculative sampling, Leviathan et al. 2023, arXiv:2211.17192;
    MTP-as-drafter as in DeepSeek-V3).  Per accept/reject theorem the
    emitted sequence is distributed EXACTLY as sequential heads=1 RAS
    decoding — bit-identical under deterministic sampling (top_k=1,
    tau_r>1), regardless of draft quality.  Throughput scales with the
    acceptance rate: each block forward costs ~1 decode step (HBM-bound at
    B=1) and commits 1 (all drafts rejected) to K (all accepted + bonus
    token from the verifier's own logits) tokens.

    Loop invariant: `pend` is the newest emitted token — counted in
    `tokens`/`num` but not yet in the KV cache; each step's block is
    [pend, draft_1 .. draft_{K-1}], so the verifier hiddens double as the
    drafting hidden for the next step and rejected drafts are shadowed by
    the next block's cache write (forward_block_with_cache advance<K).
    """
    state = init_spec_state(
        params, cfg, rng, prompt_embeds, prompt_len, min_len, max_len, sampling,
        num_heads=num_heads, max_tokens=max_tokens, cache_len_cap=cache_len_cap,
    )
    final = generate_spec_until(
        params, cfg, state, max_len, min_len, max_len, sampling,
        num_heads=num_heads,
    )
    return SpecResult(
        result=GenerateResult(
            tokens=final["tokens"][:max_tokens],
            num_tokens=final["num"],
            steps=final["steps"],
        ),
        accepted=final["accepted"],
        drafted=final["drafted"],
    )


def generate(
    params: dict,
    cfg: LLMConfig,
    rng: jax.Array,
    prompt_embeds: jnp.ndarray,  # (T_prompt, H) padded; true length below
    prompt_len: jnp.ndarray,  # scalar int32
    min_len: jnp.ndarray,  # scalar int32
    max_len: jnp.ndarray,  # scalar int32 (runtime cap, <= max_tokens)
    sampling: SamplingParams,
    *,
    inference_head_num: int,
    max_tokens: int = 1024,
    cache_len_cap: Optional[int] = None,
) -> GenerateResult:
    """Multi-head AR decode (llm_multi_head_v3.py:861-922), KV-cached.

    Per step: one base-LLM forward over the K tokens accepted in the previous
    step -> last hidden -> K MTP heads -> K sampled ids (all against the same
    history snapshot) -> accept until the first stop id.  While no stop id is
    drawn every sampled token is accepted, so running steps always commit
    exactly K tokens; the final (stopping) group commits the tokens before
    the stop id.  jit-able with static shapes throughout.
    """
    state = init_generate_state(
        params, cfg, rng, prompt_embeds, prompt_len,
        inference_head_num=inference_head_num, max_tokens=max_tokens,
        cache_len_cap=cache_len_cap,
    )
    final = generate_until(
        params, cfg, state, max_len, min_len, max_len, sampling,
        inference_head_num=inference_head_num,
    )
    return GenerateResult(
        tokens=final["tokens"][: max_tokens], num_tokens=final["num"], steps=final["steps"]
    )
