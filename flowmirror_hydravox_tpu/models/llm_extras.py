"""LLM extras: DPO training and bistream (interleaved text/speech) modes.

Reimplements reference semantics:
  - DPO forward + loss (llm_multi_head_v3.py:386-435 forward_dpo,
    utils/losses.py:24-64 DPOLoss): chosen/rejected sequences share one
    batched forward; per-sequence mean logps feed the sigmoid DPO objective.
  - Bistream training-sequence construction (llm_multi_head_v3.py:306-345):
    interleave mix_ratio=[5,15] text/speech chunks with fill tokens.
  - Bistream streaming-text inference (llm_multi_head_v3.py:521-619):
    incremental text feeding with forced fill-token cadence, KV-cached
    single-token decode.
"""

from __future__ import annotations

from typing import Generator, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LLMConfig
from ..ops.sampling import SamplingParams, ras_sample
from . import qwen2
from .llm import IGNORE_ID, build_lm_input, build_lm_targets, mtp_logits


# ---------------------------------------------------------------------------
# DPO


def dpo_loss(
    policy_chosen_logps: jnp.ndarray,
    policy_rejected_logps: jnp.ndarray,
    reference_chosen_logps: jnp.ndarray,
    reference_rejected_logps: jnp.ndarray,
    beta: float = 0.1,
    label_smoothing: float = 0.0,
    ipo: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """utils/losses.py DPOLoss.forward. Returns (loss, chosen_r, rejected_r)."""
    pi_ratios = policy_chosen_logps - policy_rejected_logps
    ref_ratios = reference_chosen_logps - reference_rejected_logps
    logits = pi_ratios - ref_ratios
    if ipo:
        losses = (logits - 1.0 / (2.0 * beta)) ** 2
    else:
        losses = (
            -jax.nn.log_sigmoid(beta * logits) * (1.0 - label_smoothing)
            - jax.nn.log_sigmoid(-beta * logits) * label_smoothing
        )
    chosen_rewards = beta * (policy_chosen_logps - reference_chosen_logps)
    rejected_rewards = beta * (policy_rejected_logps - reference_rejected_logps)
    return jnp.mean(losses), chosen_rewards, rejected_rewards


def forward_dpo(
    params: dict,
    cfg: LLMConfig,
    text_token: jnp.ndarray,  # (B, Lt)
    text_len: jnp.ndarray,
    chosen_token: jnp.ndarray,  # (B, Ls)
    chosen_len: jnp.ndarray,
    rejected_token: jnp.ndarray,  # (B, Lr)
    rejected_len: jnp.ndarray,
) -> dict:
    """Batched chosen+rejected forward (llm_multi_head_v3.py:386-435).

    Uses head 0 (the next-token head) for CE and sequence logps; returns
    {'loss', 'acc', 'chosen_logps', 'rejected_logps'} for the DPO objective
    computed by the caller against a reference model's logps."""
    b = text_token.shape[0]
    ls = max(chosen_token.shape[1], rejected_token.shape[1])

    def pad_to(x, n):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1])))

    speech = jnp.concatenate([pad_to(chosen_token, ls), pad_to(rejected_token, ls)], axis=0)
    slen = jnp.concatenate([chosen_len, rejected_len])
    text2 = jnp.concatenate([text_token, text_token], axis=0)
    tlen2 = jnp.concatenate([text_len, text_len])

    lm_input, lm_len = build_lm_input(params, cfg, text2, tlen2, speech, slen)
    hidden = qwen2.forward(params["backbone"], cfg.backbone, lm_input, lm_len)
    logits = mtp_logits(params, cfg, hidden, 1)[0]  # head 0: (2B, T, V)
    targets = build_lm_targets(cfg, tlen2, speech, slen, lm_input.shape[1])[0]  # (2B, T)

    valid = targets != IGNORE_ID
    tgt = jnp.clip(targets, 0)
    logp_all = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp_all, tgt[..., None], axis=-1)[..., 0]
    seq_logp = jnp.sum(jnp.where(valid, tok_logp, 0.0), axis=-1) / jnp.maximum(
        jnp.sum(valid, axis=-1), 1
    )

    chosen_logits, chosen_tgt = logits[:b], targets[:b]
    cvalid = chosen_tgt != IGNORE_ID
    nll = -jnp.take_along_axis(
        jax.nn.log_softmax(chosen_logits, axis=-1), jnp.clip(chosen_tgt, 0)[..., None], axis=-1
    )[..., 0]
    loss = jnp.sum(jnp.where(cvalid, nll, 0.0)) / jnp.maximum(jnp.sum(cvalid), 1)
    acc = jnp.sum(
        jnp.where(cvalid, jnp.argmax(chosen_logits, -1) == jnp.clip(chosen_tgt, 0), False)
    ) / jnp.maximum(jnp.sum(cvalid), 1)
    return {
        "loss": loss,
        "acc": acc,
        "chosen_logps": seq_logp[:b],
        "rejected_logps": seq_logp[b:],
    }


# ---------------------------------------------------------------------------
# Bistream training sequences (host-side construction)


def build_bistream_sequence(
    text_tokens: np.ndarray,
    speech_tokens: np.ndarray,
    cfg: LLMConfig,
) -> Tuple[List[Tuple[str, int]], List[int]]:
    """One sample's interleaved input plan + targets
    (llm_multi_head_v3.py:314-335, Qwen2LM.prepare_lm_input_target).

    Returns (input_plan, targets): input_plan is a list of ('sos'|'task'|
    'text'|'speech', id) items the embedding layer resolves; targets align
    1:1 with the plan (IGNORE for text positions, speech ids + fill/eos)."""
    n_text, n_speech = cfg.mix_ratio
    lt, ls = len(text_tokens), len(speech_tokens)
    plan: List[Tuple[str, int]] = [("sos", 0)]
    targets: List[int] = [IGNORE_ID]
    n_chunks = int(np.ceil((lt + 1) / n_text))
    for j in range(n_chunks):
        t_chunk = text_tokens[j * n_text : (j + 1) * n_text]
        s_chunk = speech_tokens[j * n_speech : (j + 1) * n_speech]
        if len(t_chunk) == n_text:
            targets += [IGNORE_ID] * (n_text - 1)
            targets += list(map(int, s_chunk))
            targets.append(cfg.fill_token)
            plan += [("text", int(t)) for t in t_chunk]
            plan += [("speech", int(s)) for s in s_chunk]
        else:
            targets += [IGNORE_ID] * len(t_chunk)
            targets += list(map(int, speech_tokens[j * n_speech :]))
            targets.append(cfg.eos_token)
            plan += [("text", int(t)) for t in t_chunk]
            plan += [("task", 0)]
            plan += [("speech", int(s)) for s in speech_tokens[j * n_speech :]]
    return plan, targets


def embed_plan(params: dict, cfg: LLMConfig, plan: List[Tuple[str, int]]) -> jnp.ndarray:
    """Resolve an input plan into embeddings (1, T, H)."""
    rows = []
    for kind, tid in plan:
        if kind == "sos":
            rows.append(params["speech_embedding"][cfg.sos])
        elif kind == "task":
            rows.append(params["speech_embedding"][cfg.task_id])
        elif kind == "text":
            rows.append(params["backbone"]["embed_tokens"][tid])
        else:
            rows.append(params["speech_embedding"][tid])
    return jnp.stack(rows)[None]


# ---------------------------------------------------------------------------
# Bistream inference (streaming text in, speech tokens out)


def inference_bistream(
    params: dict,
    cfg: LLMConfig,
    rng: jax.Array,
    text_chunks: Iterable[np.ndarray],  # generator of text-token arrays
    prompt_text: np.ndarray,
    prompt_speech_token: np.ndarray,
    sampling: Optional[SamplingParams] = None,
    max_tokens: int = 1024,
    cache_len_cap: int = 4096,
) -> Generator[int, None, None]:
    """Streaming-text decode (llm_multi_head_v3.py:521-619): text chunks of
    mix_ratio[0]=5 tokens interleave with mix_ratio[1]=15 generated speech
    tokens; a forced fill-token cadence keeps alignment; eos ends the final
    unistream tail.  Single-token KV-cached decode (head 0)."""
    sampling = sampling or SamplingParams.make()
    n_text, n_speech = cfg.mix_ratio
    bb = cfg.backbone

    emb_dtype = params["speech_embedding"].dtype
    cache = qwen2.init_kv_cache(bb, 1, cache_len_cap, emb_dtype)
    history = jnp.full((max_tokens + 8,), -1, jnp.int32)
    num_out = 0
    out_tokens: List[int] = []

    def feed(embeds: jnp.ndarray):
        nonlocal cache
        hidden, cache = qwen2.forward_block_with_cache(
            params["backbone"], bb, embeds.astype(emb_dtype), cache
        )
        return hidden[0, -1]

    def sample_next(last_hidden, rng, ignore_eos: bool):
        logits = mtp_logits(params, cfg, last_hidden, 1)[0]
        return ras_sample(
            rng, logits, history, jnp.int32(num_out), sampling,
            jnp.bool_(ignore_eos), cfg.speech_token_size,
        )

    # prompt: sos
    last_hidden = feed(params["speech_embedding"][cfg.sos][None, None])

    text_cache = list(map(int, prompt_text))
    speech_emb_queue = list(map(int, prompt_speech_token))
    next_fill_index = (len(prompt_speech_token) // n_speech + 1) * n_speech - len(
        prompt_speech_token
    )

    _next_fill = [next_fill_index]
    yield_queue: List[int] = []

    def decode_run():
        """Emit speech tokens until a fill token asks for more text
        (llm_multi_head_v3.py:578-599, forced fill cadence at 584-586)."""
        nonlocal last_hidden, num_out, history, rng
        while True:
            rng, step_rng = jax.random.split(rng)
            if _next_fill[0] != -1 and len(out_tokens) == _next_fill[0]:
                top = cfg.fill_token
                _next_fill[0] += n_speech + 1
            else:
                top = int(sample_next(last_hidden, step_rng, ignore_eos=True))
            if top == cfg.fill_token:
                _next_fill[0] = len(out_tokens) + n_speech + 1
            out_tokens.append(top)
            if top >= cfg.speech_token_size:
                return  # fill token: wait for more text
            yield_queue.append(top)
            history = history.at[num_out].set(top)
            num_out += 1
            last_hidden = feed(params["speech_embedding"][top][None, None])

    for chunk in text_chunks:
        text_cache += list(map(int, np.asarray(chunk).reshape(-1)))
        # interleave prompt speech with text in 5:15 ratio
        while speech_emb_queue:
            if len(text_cache) >= n_text:
                t_part, text_cache = text_cache[:n_text], text_cache[n_text:]
                s_part, speech_emb_queue = speech_emb_queue[:n_speech], speech_emb_queue[n_speech:]
                emb = jnp.concatenate(
                    [
                        params["backbone"]["embed_tokens"][jnp.asarray(t_part)],
                        params["speech_embedding"][jnp.asarray(s_part)],
                    ]
                )[None]
                last_hidden = feed(emb)
            else:
                break
        if speech_emb_queue:
            continue
        if (out_tokens and out_tokens[-1] == cfg.fill_token) or not out_tokens:
            if len(text_cache) >= n_text:
                t_part, text_cache = text_cache[:n_text], text_cache[n_text:]
                last_hidden = feed(
                    params["backbone"]["embed_tokens"][jnp.asarray(t_part)][None]
                )
            else:
                continue
        decode_run()
        while yield_queue:
            yield yield_queue.pop(0)

    # final: flush remaining text + task id, decode to eos
    emb_rows = []
    if text_cache:
        emb_rows.append(params["backbone"]["embed_tokens"][jnp.asarray(text_cache)])
    emb_rows.append(params["speech_embedding"][cfg.task_id][None])
    last_hidden = feed(jnp.concatenate(emb_rows)[None])
    while num_out < max_tokens:
        rng, step_rng = jax.random.split(rng)
        top = int(sample_next(last_hidden, step_rng, ignore_eos=False))
        out_tokens.append(top)
        if top >= cfg.speech_token_size:
            break
        yield top
        history = history.at[num_out].set(top)
        num_out += 1
        last_hidden = feed(params["speech_embedding"][top][None, None])
