"""Tiny trainable CTC ASR — the native in-repo option for stage 3.

The reference transcribes with modelscope Paraformer/SenseVoice
(scripts/preprocess/transcribe_to_dataset.py:219-418) — heavyweight external
models whose weights are not in this image.  transcribe.py reproduces all of
that stage's *orchestration* and keeps the ASR model pluggable; this module
closes the remaining model gap the native way: a small conformer-lite CTC
recognizer over 80-bin log-mel that is trainable in-repo
(train/train_asr.py) on either

  - the deterministic synthetic corpus (train/synth_speech.py), whose exact
    phoneme-like segment sequences are the transcription ground truth — the
    shipped demo checkpoint (preprocess/assets/asr.npz) comes from this
    recipe and transcribes held-out synthetic speech (see assets/README.md
    for measured token error rates); or
  - any real HF dataset with {text, audio} rows via --dataset, building a
    char vocabulary from the data — the path to a real-language checkpoint
    when a corpus exists.

Design notes (TPU-first):
  - 4x frame-stacking subsample (reshape, not conv) then d-model projection:
    the whole encoder is dense matmuls + one depthwise conv per block, all
    static shapes — one fused XLA program per bucket.
  - Blocks are conformer-lite: LN->MHSA->res, LN->(pointwise GLU -> depthwise
    conv k=9 -> pointwise)->res, LN->FFN(4d)->res; sinusoidal positions added
    once after subsampling.  ~1.3M params at the default config.
  - Loss is optax.ctc_loss (blank=0); decoding is greedy collapse (CTC
    best-path), host-side numpy over one device dispatch.

`NativeASR` is a `fn(wav, sr) -> str` callable, i.e. exactly the transcribe
stage's `--asr_module` contract; `--asr_module native` resolves to it.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Sequence

import numpy as np

SR = 16000
HOP = 160          # 10 ms mel hop
SUBSAMPLE = 4      # frame stacking factor: one logit per 40 ms


@dataclasses.dataclass(frozen=True)
class ASRModelConfig:
    n_mels: int = 80
    d_model: int = 144
    num_heads: int = 4
    num_layers: int = 3
    ffn_mult: int = 4
    conv_kernel: int = 9
    vocab_size: int = 13  # incl. blank=0; overridden by the trained vocab


def init_params(rng, cfg: ASRModelConfig = ASRModelConfig(), dtype=None):
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    d, h = cfg.d_model, cfg.num_heads
    keys = iter(jax.random.split(rng, 2 + cfg.num_layers * 10))

    def w(k, ins, outs):
        return (jax.random.normal(k, (ins, outs), jnp.float32)
                * (1.0 / ins) ** 0.5).astype(dtype)

    def ln():
        return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ln_attn": ln(),
            "wq": w(next(keys), d, d), "wk": w(next(keys), d, d),
            "wv": w(next(keys), d, d), "wo": w(next(keys), d, d),
            "ln_conv": ln(),
            "conv_in": w(next(keys), d, 2 * d),      # pointwise -> GLU
            "conv_dw": (jax.random.normal(next(keys), (cfg.conv_kernel, d),
                                          jnp.float32)
                        * (1.0 / cfg.conv_kernel) ** 0.5).astype(dtype),
            "conv_out": w(next(keys), d, d),
            "ln_ffn": ln(),
            "ffn_in": w(next(keys), d, cfg.ffn_mult * d),
            "ffn_out": w(next(keys), cfg.ffn_mult * d, d),
        })
    return {
        "embed": w(next(keys), SUBSAMPLE * cfg.n_mels, d),
        "layers": layers,
        "ln_out": ln(),
        "head": {"w": w(next(keys), d, cfg.vocab_size),
                 "b": jnp.zeros((cfg.vocab_size,), dtype)},
    }


def _layer_norm(p, x):
    import jax
    import jax.numpy as jnp

    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]


def _sin_positions(t: int, d: int):
    import jax.numpy as jnp

    pos = jnp.arange(t)[:, None].astype(jnp.float32)
    div = jnp.exp(jnp.arange(0, d, 2).astype(jnp.float32)
                  * (-np.log(10000.0) / d))
    pe = jnp.zeros((t, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


def logits(params, cfg: ASRModelConfig, wav_16k, wav_len=None):
    """wav (B, T) float32 @16 kHz -> (log-probs-ready) CTC logits
    (B, T//(HOP*SUBSAMPLE), vocab) and their frame paddings (B, F) in {0,1}
    (1 = padded), derived from per-row sample lengths `wav_len` (B,)."""
    import jax
    import jax.numpy as jnp

    from ..utils.audio import mel_spectrogram

    mel = mel_spectrogram(wav_16k, 400, cfg.n_mels, SR, HOP, 400)  # (B,M,F)
    # per-clip mean/var norm over VALID mel frames only, and padded frames
    # zeroed: stats (and therefore every logit) are independent of whatever
    # sits in the padded samples (NativeASR buckets clips to power-of-2)
    if wav_len is None:
        mframes = None
        mvalid = jnp.ones((mel.shape[0], 1, mel.shape[2]), mel.dtype)
    else:
        # count only mel frames fully inside the valid samples: frame f
        # covers original samples [f*HOP - pad_left, f*HOP - pad_left + WIN)
        # with pad_left = (WIN - HOP)//2 = 120 reflect padding
        win, pad_left = 400, (400 - HOP) // 2
        mframes = jnp.maximum((wav_len - (win - pad_left)) // HOP + 1, 1)
        mvalid = (jnp.arange(mel.shape[2])[None, None, :]
                  < mframes[:, None, None]).astype(mel.dtype)
    denom = jnp.maximum(jnp.sum(mvalid, axis=-1, keepdims=True), 1.0)
    mu = jnp.sum(mel * mvalid, axis=-1, keepdims=True) / denom
    var = jnp.sum((mel - mu) ** 2 * mvalid, axis=-1, keepdims=True) / denom
    x = (((mel - mu) * jax.lax.rsqrt(var + 1e-5)) * mvalid).transpose(0, 2, 1)
    f = (x.shape[1] // SUBSAMPLE) * SUBSAMPLE
    x = x[:, :f].reshape(x.shape[0], f // SUBSAMPLE, SUBSAMPLE * cfg.n_mels)
    x = x @ params["embed"] + _sin_positions(x.shape[1], cfg.d_model)

    b, t, d = x.shape
    h = cfg.num_heads
    if mframes is None:
        pad = jnp.zeros((b, t), jnp.float32)
    else:
        frames = jnp.maximum(mframes // SUBSAMPLE, 1)
        pad = (jnp.arange(t)[None, :] >= frames[:, None]).astype(jnp.float32)
    attn_bias = pad[:, None, None, :] * -1e9                       # (B,1,1,T)

    for lp in params["layers"]:
        y = _layer_norm(lp["ln_attn"], x)
        q = (y @ lp["wq"]).reshape(b, t, h, d // h).transpose(0, 2, 1, 3)
        k = (y @ lp["wk"]).reshape(b, t, h, d // h).transpose(0, 2, 1, 3)
        v = (y @ lp["wv"]).reshape(b, t, h, d // h).transpose(0, 2, 1, 3)
        a = jax.nn.softmax(
            q @ k.transpose(0, 1, 3, 2) / np.sqrt(d // h) + attn_bias, -1)
        y = (a @ v).transpose(0, 2, 1, 3).reshape(b, t, d) @ lp["wo"]
        x = x + y

        y = _layer_norm(lp["ln_conv"], x)
        gates = y @ lp["conv_in"]
        y = gates[..., :d] * jax.nn.sigmoid(gates[..., d:])
        y = y * (1.0 - pad[..., None])  # padded frames don't leak via conv
        k_half = cfg.conv_kernel // 2
        y = jax.lax.conv_general_dilated(
            y.transpose(0, 2, 1), lp["conv_dw"].T[:, None, :],
            window_strides=(1,), padding=[(k_half, k_half)],
            feature_group_count=d, dimension_numbers=("NCH", "OIH", "NCH"),
        ).transpose(0, 2, 1)
        x = x + jax.nn.silu(y) @ lp["conv_out"]

        y = _layer_norm(lp["ln_ffn"], x)
        x = x + jax.nn.silu(y @ lp["ffn_in"]) @ lp["ffn_out"]

    x = _layer_norm(params["ln_out"], x)
    return x @ params["head"]["w"] + params["head"]["b"], pad


def ctc_loss(params, cfg: ASRModelConfig, wavs, wav_len, labels, label_len):
    """Mean per-sequence CTC loss (optax.ctc_loss, blank=0) + greedy frame
    accuracy on non-pad frames (a cheap train-progress proxy)."""
    import jax.numpy as jnp
    import optax

    lgts, pad = logits(params, cfg, wavs, wav_len)
    label_pad = (jnp.arange(labels.shape[1])[None, :]
                 >= label_len[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(lgts, pad, labels, label_pad)
    loss = jnp.mean(per_seq / jnp.maximum(label_len.astype(jnp.float32), 1.0))
    nonblank = jnp.argmax(lgts, -1) != 0
    frac_emitting = (jnp.sum(nonblank * (1 - pad))
                     / jnp.maximum(jnp.sum(1 - pad), 1.0))
    return loss, frac_emitting


def greedy_decode(frame_ids: np.ndarray, n_frames: int) -> List[int]:
    """CTC best-path collapse of per-frame argmax ids: drop repeats then
    blanks (id 0)."""
    ids = np.asarray(frame_ids[:n_frames])
    keep = np.ones(len(ids), bool)
    keep[1:] = ids[1:] != ids[:-1]
    out = ids[keep]
    return [int(i) for i in out if i != 0]


def token_error_rate(ref: Sequence, hyp: Sequence) -> float:
    """Levenshtein distance / len(ref) — the ASR quality metric."""
    m, n = len(ref), len(hyp)
    if m == 0:
        return float(n > 0)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ref[i - 1] != hyp[j - 1]))
        prev = cur
    return prev[n] / m


# ---------------------------------------------------------------------------
# checkpoint (single npz: flattened params + vocab + config)

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "asr.npz")


def save_ckpt(path: str, params, cfg: ASRModelConfig, vocab: Sequence[str]):
    from ..train.checkpoint import _flatten

    assert len(vocab) + 1 == cfg.vocab_size, (len(vocab), cfg.vocab_size)
    np.savez(path,
             __vocab__=np.asarray(list(vocab)),
             __cfg__=np.asarray(json.dumps(dataclasses.asdict(cfg))),
             **_flatten(params))


def load_ckpt(path: str):
    """-> (params, cfg, vocab list).  The file may store any dtype (the
    shipped demo ckpt is fp16); leaves are cast to the init template's dtype
    (float32) on load — NativeASR runs the model in f32 regardless."""
    import jax

    from ..train.checkpoint import load_params_npz

    raw = np.load(path)
    cfg = ASRModelConfig(**json.loads(str(raw["__cfg__"])))
    vocab = [str(v) for v in raw["__vocab__"]]
    template = init_params(jax.random.PRNGKey(0), cfg)
    return load_params_npz(path, template), cfg, vocab


class NativeASR:
    """Trained-model `fn(wav, sr) -> str` for transcribe.py's --asr_module
    hook (the reference worker's model slot, transcribe_to_dataset.py:219-247).
    Loads preprocess/assets/asr.npz (or `path` / HYDRAVOX_ASR_NPZ); raises
    FileNotFoundError if no weights exist.  Audio is bucketed to power-of-2
    lengths so repeat calls reuse cached XLA programs."""

    def __init__(self, path: Optional[str] = None, sep: str = ""):
        import jax
        import jax.numpy as jnp

        path = path or os.environ.get("HYDRAVOX_ASR_NPZ") or _ASSET
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self.params, self.cfg, self.vocab = load_ckpt(path)
        self.params = jax.tree.map(lambda a: a.astype(jnp.float32), self.params)
        self.sep = sep
        self._fn = jax.jit(lambda w, n: logits(self.params, self.cfg, w, n))

    def __call__(self, wav: np.ndarray, sr: int = SR) -> str:
        import jax.numpy as jnp

        wav = np.asarray(wav, np.float32).reshape(-1)
        if sr != SR:
            from ..utils.audio import resample_linear

            wav = np.asarray(resample_linear(jnp.asarray(wav)[None], sr, SR))[0]
        n = max(len(wav), HOP * SUBSAMPLE * 2)
        bucket = 1 << int(np.ceil(np.log2(n)))
        padded = np.zeros(bucket, np.float32)
        padded[:len(wav)] = wav
        lgts, pad = self._fn(jnp.asarray(padded)[None],
                             jnp.asarray([len(wav)], jnp.int32))
        n_frames = int((1 - np.asarray(pad[0])).sum())
        ids = greedy_decode(np.asarray(jnp.argmax(lgts[0], -1)), n_frames)
        return self.sep.join(self.vocab[i - 1] for i in ids)


def native_asr(wav: np.ndarray, sr: int = SR) -> str:
    """Module-level hook (`--asr_module
    flowmirror_hydravox_tpu.preprocess.asr_model.native_asr`); lazily builds
    one shared NativeASR."""
    global _SHARED
    try:
        _SHARED
    except NameError:
        _SHARED = NativeASR()
    return _SHARED(wav, sr)
