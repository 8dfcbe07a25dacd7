"""On-device repetition-aware sampling (RAS, VALL-E 2 style).

TPU-native redesign of the reference's CPU-side Python sampling loop
(cosyvoice/utils/common.py:138-166 `ras_sampling`/`nucleus_sampling`/
`random_sampling` and llm_multi_head_v3.py:151-166 `sampling_ids`):

  - The reference's nucleus set is built by iterating sorted probs and
    including index i while (sum of previously included probs) < top_p AND
    fewer than top_k tokens are included.  We express the identical set as
    `exclusive_cumsum(sorted_p) < top_p  AND  rank < top_k` and sample with a
    Gumbel trick — one fused XLA kernel, no host round-trip.
  - The reference's `sampling_ids` resamples (up to 100 trials) until the
    draw is a non-stop token when `ignore_eos=True`.  Rejection-resampling a
    categorical until it lands outside a set is distributionally identical to
    renormalizing the distribution with that set removed, so we mask the stop
    ids and sample once.  (Exact equivalence for the nucleus candidate;
    for the repetition fallback the reference re-runs the full procedure,
    which re-draws the nucleus candidate too — a negligible higher-order
    difference we accept and document here.)
  - The repetition test (count of the candidate among the last `win_size`
    decoded tokens >= win_size * tau_r -> fall back to plain multinomial)
    runs on a device-resident token buffer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplingParams(NamedTuple):
    top_p: jnp.ndarray  # f32 scalar
    top_k: jnp.ndarray  # i32 scalar
    win_size: jnp.ndarray  # i32 scalar
    tau_r: jnp.ndarray  # f32 scalar

    @staticmethod
    def make(top_p=0.8, top_k=25, win_size=10, tau_r=0.1) -> "SamplingParams":
        return SamplingParams(
            jnp.float32(top_p), jnp.int32(top_k), jnp.int32(win_size), jnp.float32(tau_r)
        )


def _gumbel_argmax(rng, log_probs):
    g = jax.random.gumbel(rng, log_probs.shape, dtype=jnp.float32)
    return jnp.argmax(log_probs + g).astype(jnp.int32)


# Nucleus candidates are drawn from at most KMAX top tokens: the reference's
# set is capped by top_k (defaults <= 25, server <= 25), so a static top-64
# window is exact for every production config while replacing the full-vocab
# sort (6,761 entries — ~0.7 ms/step of pure VPU sorting) with lax.top_k.
NUCLEUS_KMAX = 64


def nucleus_sample(rng: jax.Array, logits: jnp.ndarray, top_p, top_k) -> jnp.ndarray:
    """Sample from the reference's nucleus set (common.py:146-161).

    logits: (V,) f32 (already masked if needed). Returns scalar int32 token.
    Exact as long as top_k <= NUCLEUS_KMAX (runtime top_k is clamped).
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32))
    kmax = min(NUCLEUS_KMAX, probs.shape[0])
    # top_k ties break toward the lower index — identical to the stable
    # descending sort the reference uses
    top_vals, top_idx = jax.lax.top_k(probs, kmax)
    excl_cum = jnp.cumsum(top_vals) - top_vals
    rank = jnp.arange(kmax)
    keep = (excl_cum < top_p) & (rank < jnp.minimum(top_k, kmax))
    kept_logp = jnp.where(keep, jnp.log(jnp.maximum(top_vals, 1e-30)), -jnp.inf)
    pick = _gumbel_argmax(rng, kept_logp)
    return top_idx[pick].astype(jnp.int32)


def _ras_candidate(rng, logits, token_history, num_decoded, params, ignore_eos,
                   speech_token_size: int):
    """Nucleus-candidate phase of a RAS step: returns (candidate, repeated,
    masked_logits, rng_flat) so the caller can defer the full-vocab fallback
    (plain-multinomial gumbel over V) behind a lax.cond — the repetition
    fallback fires on a small minority of steps, but drawing it eagerly
    costs a V-wide log_softmax + gumbel + argmax per head per step."""
    v = logits.shape[0]
    token_ids = jnp.arange(v)
    is_stop = token_ids >= speech_token_size
    masked_logits = jnp.where(ignore_eos & is_stop, -jnp.inf, logits.astype(jnp.float32))

    rng_nuc, rng_flat = jax.random.split(rng)
    candidate = nucleus_sample(rng_nuc, masked_logits, params.top_p, params.top_k)

    # repetition count over the last win_size decoded tokens
    hist_pos = jnp.arange(token_history.shape[0])
    in_window = (hist_pos < num_decoded) & (hist_pos >= num_decoded - params.win_size)
    rep_num = jnp.sum(in_window & (token_history == candidate))
    repeated = rep_num.astype(jnp.float32) >= params.win_size.astype(jnp.float32) * params.tau_r
    return candidate.astype(jnp.int32), repeated, masked_logits, rng_flat


def ras_sample(
    rng: jax.Array,
    logits: jnp.ndarray,  # (V,) raw logits (log-softmax offset is irrelevant)
    token_history: jnp.ndarray,  # (L,) int32 decoded tokens buffer (padded with -1)
    num_decoded: jnp.ndarray,  # scalar int32 — valid tokens in history
    params: SamplingParams,
    ignore_eos: jnp.ndarray,  # scalar bool
    speech_token_size: int,
) -> jnp.ndarray:
    """Full RAS step on device. Returns scalar int32 token id.

    The repetition fallback (plain multinomial over V) is computed under
    lax.cond: bit-identical values when taken (same rng_flat split, same
    gumbel draw), skipped entirely otherwise.  NOTE: under vmap the cond
    lowers to a select (both branches run) — batched callers should use
    ras_sample_heads' hoisted any() cond instead."""
    candidate, repeated, masked_logits, rng_flat = _ras_candidate(
        rng, logits, token_history, num_decoded, params, ignore_eos,
        speech_token_size)
    return jax.lax.cond(
        repeated,
        lambda: _gumbel_argmax(rng_flat, jax.nn.log_softmax(masked_logits)),
        lambda: candidate,
    ).astype(jnp.int32)


def ras_dist(
    logits: jnp.ndarray,  # (V,) raw logits
    token_history: jnp.ndarray,  # (L,) int32 decoded tokens buffer (padded with -1)
    num_decoded: jnp.ndarray,  # scalar int32
    params: SamplingParams,
    ignore_eos: jnp.ndarray,  # scalar bool
    speech_token_size: int,
) -> jnp.ndarray:
    """Exact marginal distribution of `ras_sample` as an explicit (V,) vector.

    ras_sample draws a candidate c from the nucleus distribution P_nuc and
    falls back to the plain softmax P_flat iff c is window-repeated, so its
    marginal is

        P(x) = P_nuc(x) * [not repeated(x)] + (sum_c P_nuc(c) * repeated(c)) * P_flat(x).

    Needed by speculative verification (models/llm.py generate_speculative),
    where accept/reject tests require the target and draft *probabilities*,
    not just samples.  Sampling categorically from this vector is
    distribution-identical to calling ras_sample.
    """
    v = logits.shape[0]
    token_ids = jnp.arange(v)
    is_stop = token_ids >= speech_token_size
    masked = jnp.where(ignore_eos & is_stop, -jnp.inf, logits.astype(jnp.float32))
    probs = jax.nn.softmax(masked)

    kmax = min(NUCLEUS_KMAX, v)
    top_vals, top_idx = jax.lax.top_k(probs, kmax)
    excl_cum = jnp.cumsum(top_vals) - top_vals
    keep = (excl_cum < params.top_p) & (jnp.arange(kmax) < jnp.minimum(params.top_k, kmax))
    kept = jnp.where(keep, top_vals, 0.0)
    p_nuc_top = kept / jnp.maximum(jnp.sum(kept), 1e-30)
    p_nuc = jnp.zeros((v,), jnp.float32).at[top_idx].add(p_nuc_top)

    # repeated(x) for every vocab id: count of x in the last win_size decoded
    hist_pos = jnp.arange(token_history.shape[0])
    in_window = (hist_pos < num_decoded) & (hist_pos >= num_decoded - params.win_size)
    counts = jnp.zeros((v,), jnp.float32).at[
        jnp.clip(token_history, 0, v - 1)
    ].add(in_window.astype(jnp.float32))
    repeated = counts >= params.win_size.astype(jnp.float32) * params.tau_r

    fallback_mass = jnp.sum(jnp.where(repeated, p_nuc, 0.0))
    return jnp.where(repeated, 0.0, p_nuc) + fallback_mass * probs


def sample_dist(rng: jax.Array, dist: jnp.ndarray) -> jnp.ndarray:
    """Categorical draw from an explicit probability vector (V,)."""
    return _gumbel_argmax(rng, jnp.log(jnp.maximum(dist, 1e-30)))


def ras_sample_heads(
    rng: jax.Array,
    head_logits: jnp.ndarray,  # (K, V) — one row per MTP head
    token_history: jnp.ndarray,  # (L,) int32
    num_decoded: jnp.ndarray,  # scalar int32
    params: SamplingParams,
    min_len: jnp.ndarray,  # scalar int32
    speech_token_size: int,
) -> jnp.ndarray:
    """Sample all MTP heads against the same history snapshot
    (llm_multi_head_v3.py:890-900): head j uses ignore_eos iff
    num_decoded + j < min_len. Returns (K,) int32.

    The rare repetition fallback is hoisted behind ONE lax.cond over
    any(repeated): the common step skips K full-vocab log_softmax + gumbel
    + argmax chains entirely (measured ~0.2 ms/step of the heads=4 SOLO
    decode), and when the cond fires the fallback draws the exact values the
    eager form drew (same per-head rng_flat splits), so tokens are
    bit-identical.  Scope of the saving: callers that vmap this function
    over slots/rows (the continuous chunk program, batched decode) lower
    the cond to a select — both branches execute there, so only the
    non-vmapped solo/streaming decode path gets the ~0.2 ms."""
    k = head_logits.shape[0]
    rngs = jax.random.split(rng, k)
    ignore = (num_decoded + jnp.arange(k)) < min_len

    cands, reps, maskeds, rng_flats = jax.vmap(
        _ras_candidate, in_axes=(0, 0, None, None, None, 0, None)
    )(rngs, head_logits, token_history, num_decoded, params, ignore,
      speech_token_size)

    def fallback():
        flats = jax.vmap(
            lambda r, m: _gumbel_argmax(r, jax.nn.log_softmax(m))
        )(rng_flats, maskeds)
        return jnp.where(reps, flats, cands).astype(jnp.int32)

    return jax.lax.cond(jnp.any(reps), fallback, lambda: cands)
