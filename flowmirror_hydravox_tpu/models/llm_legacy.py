"""CV1/CV2-generation speech-token LMs (capability parity).

Reimplements:
  - Qwen2LM (CV2, llm_multi_head_v3.py:263-619): single-head AR decode on the
    Qwen2 backbone.  Differs from CosyVoice3LM in special-token bookkeeping:
    sos=0 / task=1 live in a separate 2-row `llm_embedding` table, eos =
    speech_token_size, vocab = speech_token_size + 3, and `llm_decoder` has a
    bias (llm_multi_head_v3.py:285-287).
  - TransformerLM (CV1, llm_multi_head_v3.py:35-229): conformer text encoder
    + affine -> transformer LM over [sos, spk, text, task, speech] with a
    speaker-embedding row; decode with the same cached loop.
Both reuse the qwen2/conformer building blocks and the on-device RAS
sampler; decode runs as a KV-cached while_loop like models/llm.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Qwen2Config
from ..ops.sampling import SamplingParams, ras_sample
from . import qwen2
from .conformer import ConformerConfig, encoder_forward, init_encoder_params
from .dit import _linear_init, linear
from .llm import IGNORE_ID


@dataclasses.dataclass(frozen=True)
class Qwen2LMConfig:
    backbone: Qwen2Config = Qwen2Config()
    speech_token_size: int = 6561
    mix_ratio: Tuple[int, int] = (5, 15)

    @property
    def vocab_size(self) -> int:
        return self.speech_token_size + 3

    @property
    def eos_token(self) -> int:
        return self.speech_token_size

    @property
    def fill_token(self) -> int:
        return self.speech_token_size + 2


def init_qwen2lm_params(rng: jax.Array, cfg: Qwen2LMConfig, dtype=jnp.bfloat16) -> dict:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    h = cfg.backbone.hidden_size

    def w(key, *shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

    return {
        "backbone": qwen2.init_params(k1, cfg.backbone, dtype),
        "llm_embedding": w(k2, 2, h),  # rows: sos, task
        "speech_embedding": w(k3, cfg.vocab_size, h),
        "llm_decoder": _linear_init(k4, h, cfg.vocab_size, dtype),  # with bias
    }


def qwen2lm_forward_loss(
    params: dict,
    cfg: Qwen2LMConfig,
    text_token: jnp.ndarray,
    text_len: jnp.ndarray,
    speech_token: jnp.ndarray,
    speech_len: jnp.ndarray,
) -> dict:
    """Unistream CE loss (llm_multi_head_v3.py:336-384): input
    [sos, text, task, speech], target [IGNORE*(1+lt), speech, eos]."""
    b, lt = text_token.shape
    ls = speech_token.shape[1]
    t_total = 2 + lt + ls
    pos = jnp.arange(t_total)

    text_emb = qwen2.embed_tokens(params["backbone"], jnp.clip(text_token, 0))
    speech_emb = jnp.take(params["speech_embedding"], jnp.clip(speech_token, 0), axis=0)
    sos, task = params["llm_embedding"][0], params["llm_embedding"][1]

    def assemble(te, se, tl, sl):
        ti = jnp.clip(pos - 1, 0, lt - 1)
        si = jnp.clip(pos - tl - 2, 0, ls - 1)
        return jnp.where(
            (pos == 0)[:, None], sos[None],
            jnp.where(
                ((pos >= 1) & (pos <= tl))[:, None], te[ti],
                jnp.where((pos == tl + 1)[:, None], task[None], se[si]),
            ),
        )

    lm_input = jax.vmap(assemble)(text_emb, speech_emb, text_len, speech_len)
    lm_len = 2 + text_len + speech_len
    hidden = qwen2.forward(params["backbone"], cfg.backbone, lm_input, lm_len)
    logits = linear(params["llm_decoder"], hidden).astype(jnp.float32)

    def tgt(sp, tl, sl):
        si = pos - (1 + tl)
        in_sp = (pos >= 1 + tl) & (si < sl)
        is_eos = pos == (1 + tl) + sl
        return jnp.where(in_sp, sp[jnp.clip(si, 0, ls - 1)],
                         jnp.where(is_eos, cfg.eos_token, IGNORE_ID))

    targets = jax.vmap(tgt)(speech_token, text_len, speech_len)
    valid = targets != IGNORE_ID
    nll = -jnp.take_along_axis(
        jax.nn.log_softmax(logits, -1), jnp.clip(targets, 0)[..., None], axis=-1
    )[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / denom
    acc = jnp.sum(jnp.where(valid, jnp.argmax(logits, -1) == jnp.clip(targets, 0), False)) / denom
    return {"loss": loss, "acc": acc}


def qwen2lm_generate(
    params: dict,
    cfg: Qwen2LMConfig,
    rng: jax.Array,
    text_token: jnp.ndarray,  # (Lt,) prompt_text + text tokens (padded)
    text_len: jnp.ndarray,
    prompt_speech_token: jnp.ndarray,  # (Lp,)
    prompt_speech_len: jnp.ndarray,
    min_len: jnp.ndarray,
    max_len: jnp.ndarray,
    sampling: SamplingParams,
    *,
    max_tokens: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-token KV-cached decode (llm_multi_head_v3.py:505-519) as a
    device-side while_loop. Returns (tokens, num)."""
    bb = cfg.backbone
    lt, lp = text_token.shape[0], prompt_speech_token.shape[0]
    t_total = 2 + lt + lp
    pos = jnp.arange(t_total)
    text_emb = qwen2.embed_tokens(params["backbone"], jnp.clip(text_token, 0))
    sp_emb = jnp.take(params["speech_embedding"], jnp.clip(prompt_speech_token, 0), axis=0)
    sos, task = params["llm_embedding"][0], params["llm_embedding"][1]
    ti = jnp.clip(pos - 1, 0, lt - 1)
    si = jnp.clip(pos - text_len - 2, 0, max(lp - 1, 0))
    prompt = jnp.where(
        (pos == 0)[:, None], sos[None],
        jnp.where(
            ((pos >= 1) & (pos <= text_len))[:, None], text_emb[ti],
            jnp.where((pos == text_len + 1)[:, None], task[None],
                      sp_emb[si] if lp > 0 else jnp.zeros_like(sos)[None]),
        ),
    ).astype(text_emb.dtype)
    plen = 2 + text_len + prompt_speech_len

    cache = qwen2.init_kv_cache(bb, 1, t_total + max_tokens + 1, prompt.dtype)
    hidden, cache = qwen2.forward_block_with_cache(
        params["backbone"], bb, prompt[None], cache, advance=plen[None]
    )
    state = dict(
        rng=rng, cache=cache, last_hidden=hidden[0, plen - 1],
        tokens=jnp.full((max_tokens,), -1, jnp.int32),
        num=jnp.int32(0), finished=jnp.bool_(False),
    )

    def cond(s):
        return ~s["finished"]

    def body(s):
        rng, step_rng = jax.random.split(s["rng"])
        logits = linear(params["llm_decoder"], s["last_hidden"]).astype(jnp.float32)
        tok = ras_sample(
            step_rng, logits, s["tokens"], s["num"], sampling,
            s["num"] < min_len, cfg.speech_token_size,
        )
        is_stop = tok >= cfg.speech_token_size
        tokens = s["tokens"].at[s["num"]].set(jnp.where(is_stop, s["tokens"][s["num"]], tok))
        num = s["num"] + jnp.where(is_stop, 0, 1)
        finished = is_stop | (num >= max_len)

        def cont(cache):
            emb = params["speech_embedding"][tok][None, None].astype(prompt.dtype)
            h, cache = qwen2.forward_block_with_cache(params["backbone"], bb, emb, cache)
            return h[0, 0], cache

        last_hidden, cache = jax.lax.cond(finished, lambda c: (s["last_hidden"], c), cont, s["cache"])
        return dict(rng=rng, cache=cache, last_hidden=last_hidden,
                    tokens=tokens, num=num, finished=finished)

    final = jax.lax.while_loop(cond, body, state)
    return final["tokens"], final["num"]


# ---------------------------------------------------------------------------
# TransformerLM (CV1)


@dataclasses.dataclass(frozen=True)
class TransformerLMConfig:
    text_encoder_input_size: int = 512
    llm_input_size: int = 1024
    llm_output_size: int = 1024
    text_token_size: int = 51866
    speech_token_size: int = 4096
    spk_embed_dim: int = 192
    text_encoder: ConformerConfig = ConformerConfig(
        input_size=512, output_size=512, attention_heads=8, linear_units=2048, num_blocks=6
    )
    llm: ConformerConfig = ConformerConfig(
        input_size=1024, output_size=1024, attention_heads=8, linear_units=2048,
        num_blocks=7, use_cnn_module=False, macaron_style=False,
    )


def init_transformerlm_params(rng: jax.Array, cfg: TransformerLMConfig,
                              dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 10))

    def w(key, *shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

    return {
        "text_embedding": w(next(keys), cfg.text_token_size, cfg.text_encoder_input_size),
        "text_encoder": init_encoder_params(next(keys), cfg.text_encoder,
                                            cfg.text_encoder.num_blocks, dtype),
        "text_encoder_affine": _linear_init(next(keys), cfg.text_encoder.output_size,
                                            cfg.llm_input_size, dtype),
        "llm_embedding": w(next(keys), 2, cfg.llm_input_size),
        "llm": init_encoder_params(next(keys), cfg.llm, cfg.llm.num_blocks, dtype),
        "llm_decoder": _linear_init(next(keys), cfg.llm_output_size,
                                    cfg.speech_token_size + 1, dtype),
        "speech_embedding": w(next(keys), cfg.speech_token_size, cfg.llm_input_size),
        "spk_embed_affine": _linear_init(next(keys), cfg.spk_embed_dim,
                                         cfg.llm_input_size, dtype),
    }


def transformerlm_forward_loss(
    params: dict,
    cfg: TransformerLMConfig,
    text_token: jnp.ndarray,  # (B, Lt)
    text_len: jnp.ndarray,
    speech_token: jnp.ndarray,  # (B, Ls)
    speech_len: jnp.ndarray,
    embedding: jnp.ndarray,  # (B, 192)
    dropout_rng=None,
) -> dict:
    """CV1 loss (llm_multi_head_v3.py:101-149): conformer-encoded text +
    speaker row; input [sos, spk, text_enc, task, speech]; causal LM CE.
    Pass dropout_rng at train time for encoder dropout (rate 0.1)."""
    b, lt = text_token.shape
    ls = speech_token.shape[1]
    text_emb = jnp.take(params["text_embedding"], jnp.clip(text_token, 0), axis=0)
    enc, _ = encoder_forward(params["text_encoder"], cfg.text_encoder, text_emb, text_len,
                             dropout_rng=dropout_rng)
    enc = linear(params["text_encoder_affine"], enc)

    spk = embedding / jnp.maximum(
        jnp.linalg.norm(embedding.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
    )
    spk = linear(params["spk_embed_affine"], spk.astype(enc.dtype))
    speech_emb = jnp.take(params["speech_embedding"], jnp.clip(speech_token, 0), axis=0)
    sos, task = params["llm_embedding"][0], params["llm_embedding"][1]

    t_total = 3 + lt + ls  # sos + spk + text + task + speech
    pos = jnp.arange(t_total)

    def assemble(sp_row, te, se, tl, sl):
        ti = jnp.clip(pos - 2, 0, lt - 1)
        si = jnp.clip(pos - tl - 3, 0, ls - 1)
        return jnp.where(
            (pos == 0)[:, None], sos[None],
            jnp.where(
                (pos == 1)[:, None], sp_row[None],
                jnp.where(
                    ((pos >= 2) & (pos <= tl + 1))[:, None], te[ti],
                    jnp.where((pos == tl + 2)[:, None], task[None], se[si]),
                ),
            ),
        )

    lm_input = jax.vmap(assemble)(spk, enc, speech_emb, text_len, speech_len)
    lm_len = 3 + text_len + speech_len
    # the CV1 "llm" is a transformer encoder run with a causal mask: reuse
    # conformer encoder blocks with causal chunking via attn mask
    out, _ = _causal_encoder(params["llm"], cfg.llm, lm_input, lm_len)
    logits = linear(params["llm_decoder"], out).astype(jnp.float32)

    def tgt(sp, tl, sl):
        si = pos - (2 + tl)
        in_sp = (pos >= 2 + tl) & (si < sl)
        is_eos = pos == (2 + tl) + sl
        return jnp.where(in_sp, sp[jnp.clip(si, 0, ls - 1)],
                         jnp.where(is_eos, cfg.speech_token_size, IGNORE_ID))

    targets = jax.vmap(tgt)(speech_token, text_len, speech_len)
    valid = targets != IGNORE_ID
    nll = -jnp.take_along_axis(
        jax.nn.log_softmax(logits, -1), jnp.clip(targets, 0)[..., None], axis=-1
    )[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / denom
    acc = jnp.sum(jnp.where(valid, jnp.argmax(logits, -1) == jnp.clip(targets, 0), False)) / denom
    return {"loss": loss, "acc": acc}


def transformerlm_generate(
    params: dict,
    cfg: TransformerLMConfig,
    rng: jax.Array,
    text_token: jnp.ndarray,  # (Lt,) padded
    text_len: jnp.ndarray,  # scalar
    embedding: jnp.ndarray,  # (192,)
    min_len: jnp.ndarray,
    max_len: jnp.ndarray,
    sampling: SamplingParams,
    *,
    max_tokens: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CV1 AR decode (TransformerLM.inference, llm_multi_head_v3.py:168-229).

    The reference streams through forward_chunk's attention cache; here the
    whole padded sequence re-encodes each step inside a bounded while_loop —
    the same full-prefix-recompute strategy the reference's served CV3 path
    uses (llm_multi_head_v3.py:873-882). Fine for the legacy stack; the
    flagship CV3 decode (models/llm.py) is the KV-cached fast path.
    Returns (tokens (max_tokens,), num)."""
    lt = text_token.shape[0]
    text_emb = jnp.take(params["text_embedding"], jnp.clip(text_token, 0), axis=0)
    enc, _ = encoder_forward(params["text_encoder"], cfg.text_encoder,
                             text_emb[None], text_len[None])
    enc = linear(params["text_encoder_affine"], enc)[0]
    spk = embedding / jnp.maximum(
        jnp.linalg.norm(embedding.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
    )
    spk = linear(params["spk_embed_affine"], spk.astype(enc.dtype))
    sos, task = params["llm_embedding"][0], params["llm_embedding"][1]

    t_total = 3 + lt + max_tokens
    pos = jnp.arange(t_total)
    ti = jnp.clip(pos - 2, 0, lt - 1)
    base = jnp.where(
        (pos == 0)[:, None], sos[None],
        jnp.where(
            (pos == 1)[:, None], spk[None],
            jnp.where(((pos >= 2) & (pos <= text_len + 1))[:, None], enc[ti],
                      task[None]),
        ),
    ).astype(enc.dtype)

    state = dict(
        rng=rng, seq=base,
        tokens=jnp.full((max_tokens,), -1, jnp.int32),
        num=jnp.int32(0), finished=jnp.bool_(False),
    )
    prefix = 3 + text_len  # sos, spk, text, task

    def cond(s):
        return ~s["finished"]

    def body(s):
        rng, step_rng = jax.random.split(s["rng"])
        cur_len = prefix + s["num"]
        out, _ = _causal_encoder(params["llm"], cfg.llm, s["seq"][None],
                                 cur_len[None])
        hidden = out[0, cur_len - 1]
        logits = linear(params["llm_decoder"], hidden).astype(jnp.float32)
        tok = ras_sample(
            step_rng, logits, s["tokens"], s["num"], sampling,
            s["num"] < min_len, cfg.speech_token_size,
        )
        is_stop = tok >= cfg.speech_token_size
        tokens = s["tokens"].at[s["num"]].set(
            jnp.where(is_stop, s["tokens"][s["num"]], tok))
        num = s["num"] + jnp.where(is_stop, 0, 1)
        emb = params["speech_embedding"][jnp.clip(tok, 0, cfg.speech_token_size - 1)]
        seq = jax.lax.dynamic_update_slice(
            s["seq"], emb[None].astype(s["seq"].dtype), (cur_len, 0))
        finished = is_stop | (num >= max_len) | (num >= max_tokens)
        return dict(rng=rng, seq=jnp.where(is_stop, s["seq"], seq),
                    tokens=tokens, num=num, finished=finished)

    final = jax.lax.while_loop(cond, body, state)
    return final["tokens"], final["num"]


def _causal_encoder(params, cfg: ConformerConfig, x, lens):
    """Conformer blocks under a causal attention mask (the CV1 LM runs its
    TransformerEncoder with tril masks, llm_multi_head_v3.py:216-220)."""
    import math as _math

    from .conformer import _chunk_attn_mask, _conformer_layer, _layer_norm, espnet_rel_pos

    b, t, _ = x.shape
    valid = jnp.arange(t)[None, :] < lens[:, None]
    h = _layer_norm(linear(params["embed_linear"], x), params["embed_norm"])
    h = h * _math.sqrt(cfg.output_size)
    causal = jnp.arange(t)[:, None] >= jnp.arange(t)[None, :]
    attn_mask = _chunk_attn_mask(valid, 0) & causal[None]
    pe = jnp.asarray(espnet_rel_pos(t, cfg.output_size), h.dtype)
    for layer in params["layers"]:
        pos_proj = (pe @ layer["linear_pos"]["w"]).reshape(
            2 * t - 1, cfg.attention_heads, cfg.output_size // cfg.attention_heads
        )
        h = _conformer_layer(layer, h, pos_proj, attn_mask, valid, cfg)
    return _layer_norm(h, params["after_norm"]), valid
