"""Training: optimizer step sanity, loss decreases, checkpoint roundtrip,
data pipeline collators, CLI smoke on a synthetic dataset."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.models import llm as llm_model
from flowmirror_hydravox_tpu.train import checkpoint as ckpt
from flowmirror_hydravox_tpu.train.data import FlowCollator, LLMCollator, batch_iterator
from flowmirror_hydravox_tpu.train.steps import (
    OptimConfig, init_state, llm_train_step, make_optimizer,
)

CFG = tiny_config().llm


def _batch(rng, b=2, lt=6, ls=12):
    return {
        "text_token": jax.random.randint(rng, (b, lt), 0, 200),
        "text_len": jnp.full((b,), lt, jnp.int32),
        "speech_token": jax.random.randint(rng, (b, ls), 0, CFG.speech_token_size),
        "speech_len": jnp.full((b,), ls, jnp.int32),
    }


def test_llm_loss_decreases():
    params = llm_model.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    opt = make_optimizer(OptimConfig(learning_rate=3e-3, warmup_steps=1, total_steps=100))
    state = init_state(params, opt)
    batch = _batch(jax.random.PRNGKey(1))
    step = jax.jit(lambda s, b: llm_train_step(s, b, CFG, opt))
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_nonfinite_grad_skipped():
    params = llm_model.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    opt = make_optimizer(OptimConfig())
    state = init_state(params, opt)
    bad = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan), params)
    from flowmirror_hydravox_tpu.train.steps import _apply_grads

    new_state, gnorm = _apply_grads(state, bad, opt)
    assert not np.isfinite(float(gnorm))
    # params unchanged
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), new_state.params, params)
    assert max(jax.tree.leaves(diffs)) == 0.0


def test_params_npz_roundtrip(tmp_path):
    params = llm_model.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    path = str(tmp_path / "p.npz")
    ckpt.save_params_npz(path, params)
    loaded = ckpt.load_params_npz(path, params)
    chex_equal = jax.tree.map(lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
                              params, loaded)
    assert all(jax.tree.leaves(chex_equal))


def test_average_checkpoints(tmp_path):
    p1 = llm_model.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    p2 = llm_model.init_params(jax.random.PRNGKey(1), CFG, jnp.float32)
    ckpt.save_params_npz(str(tmp_path / "a.npz"), p1)
    ckpt.save_params_npz(str(tmp_path / "b.npz"), p2)
    avg = ckpt.average_checkpoints([str(tmp_path / "a.npz"), str(tmp_path / "b.npz")], p1)
    want = (np.asarray(p1["llm_decoder"]) + np.asarray(p2["llm_decoder"])) / 2
    np.testing.assert_allclose(np.asarray(avg["llm_decoder"]), want, atol=1e-6)


def test_graft_mtp_weights():
    base = llm_model.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    stripped = {k: v for k, v in base.items() if k != "mtp_block"}
    grafted = ckpt.graft_mtp_weights(stripped, CFG, jax.random.PRNGKey(7), jnp.float32)
    assert "mtp_block" in grafted
    assert grafted["mtp_block"]["gate_proj_w"].shape[0] == CFG.head_num
    # backbone untouched
    assert grafted["backbone"] is stripped["backbone"]


class _ListDataset(list):
    pass


def test_llm_collator_and_iterator():
    from flowmirror_hydravox_tpu.frontend.tokenizer import ByteTokenizer

    rng = np.random.default_rng(0)
    rows = _ListDataset(
        {"text": f"sample number {i}", "speech_token": rng.integers(0, 50, rng.integers(5, 20)).tolist()}
        for i in range(10)
    )
    coll = LLMCollator(ByteTokenizer(), text_buckets=(32,), speech_buckets=(32,))
    batches = list(batch_iterator(rows, coll, batch_size=4, epochs=1, sort_window=8))
    assert len(batches) == 2  # 10 rows, drop_last
    b = batches[0]
    assert b["text_token"].shape == (4, 32)
    assert (b["speech_len"] > 0).all()


def test_flow_collator():
    rng = np.random.default_rng(0)
    rows = [
        {
            "speech_token": rng.integers(0, 50, 10).tolist(),
            "mel": rng.standard_normal((20, 80)).astype(np.float32),
            "embedding": rng.standard_normal(192).astype(np.float32),
        }
        for _ in range(3)
    ]
    coll = FlowCollator(token_buckets=(16,))
    b = coll(rows)
    assert b["speech_token"].shape == (3, 16)
    assert b["speech_feat"].shape == (3, 32, 80)
    assert (b["feat_len"] == 2 * b["token_len"]).all()


def test_dynamic_batch_iterator_budget_and_pow2():
    """Frame-budget batching (reference processor.py:324-350) with TPU
    power-of-2 batch padding: padded rows carry zero lengths."""
    from flowmirror_hydravox_tpu.frontend.tokenizer import ByteTokenizer
    from flowmirror_hydravox_tpu.train.data import dynamic_batch_iterator

    rng = np.random.default_rng(0)
    rows = [
        {"text": "x" * int(n), "speech_token": rng.integers(0, 50, int(n)).tolist()}
        for n in rng.integers(5, 30, 20)
    ]
    coll = LLMCollator(ByteTokenizer(), text_buckets=(64,), speech_buckets=(64,))
    batches = list(dynamic_batch_iterator(
        rows, coll, max_frames_in_batch=100,
        length_fn=lambda r: len(r["speech_token"]), min_batch_multiple=2,
    ))
    assert len(batches) >= 2
    for b in batches:
        bs = b["speech_token"].shape[0]
        assert bs & (bs - 1) == 0 and bs >= 2  # power of two, >= DP shards
        # budget respected before padding: valid rows * longest <= 100
        valid = int((b["speech_len"] > 0).sum())
        assert valid * int(b["speech_len"].max()) <= 100 or valid == 1
        # padded rows are all-zero (masked out of the loss)
        assert (b["speech_len"][valid:] == 0).all()


def test_shard_list_iterator_parquet_and_hf(tmp_path):
    """Shard-list chain (reference dataset/dataset.py:51-122): parquet +
    HF-dataset shards, rank/worker modulo sharding."""
    import datasets
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flowmirror_hydravox_tpu.train.data import shard_list_iterator

    pq.write_table(pa.table({"text": ["p0", "p1"], "speech_token": [[1], [2, 3]]}),
                   str(tmp_path / "shard0.parquet"))
    datasets.Dataset.from_list(
        [{"text": "h0", "speech_token": [4]}]).save_to_disk(str(tmp_path / "shard1"))
    lst = tmp_path / "shards.txt"
    lst.write_text(f"{tmp_path}/shard0.parquet\n{tmp_path}/shard1\n")

    rows = list(shard_list_iterator(str(lst), epochs=1, shuffle=False))
    assert {r["text"] for r in rows} == {"p0", "p1", "h0"}
    # two ranks split the two shards disjointly
    r0 = {r["text"] for r in shard_list_iterator(str(lst), rank=0, world_size=2,
                                                 epochs=1, shuffle=False)}
    r1 = {r["text"] for r in shard_list_iterator(str(lst), rank=1, world_size=2,
                                                 epochs=1, shuffle=False)}
    assert r0 | r1 == {"p0", "p1", "h0"} and not (r0 & r1)


# -- gradient accumulation (reference train_utils.py:277-291 / HF
#    gradient_accumulation_steps; here a lax.scan inside one jitted step) ----


@pytest.mark.quick
def test_grad_accum_llm_matches_full_batch():
    """accum_steps=2 over equal-length micro-batches produces the same
    update as the full-batch step (mean-of-micro-means == full mean when
    every row has the same valid-token count)."""
    params = llm_model.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    opt = make_optimizer(OptimConfig(learning_rate=1e-3, warmup_steps=1,
                                     total_steps=100))
    batch = _batch(jax.random.PRNGKey(2), b=4)
    s_full = init_state(params, opt)
    s_acc = init_state(params, opt)
    full = jax.jit(lambda s, b: llm_train_step(s, b, CFG, opt))
    acc = jax.jit(lambda s, b: llm_train_step(s, b, CFG, opt, accum_steps=2))
    n_full, m_full = full(s_full, batch)
    n_acc, m_acc = acc(s_acc, batch)
    assert abs(float(m_full["loss"]) - float(m_acc["loss"])) < 1e-5
    assert np.isclose(float(m_full["grad_norm"]), float(m_acc["grad_norm"]),
                      rtol=1e-4)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         n_full.params, n_acc.params)
    assert max(jax.tree.leaves(diffs)) < 2e-5, sorted(
        jax.tree.leaves(diffs))[-3:]


def test_grad_accum_flow_splits_rng_per_micro_batch():
    """The flow accum path gives each micro-batch its own rng split; the
    accumulated grads equal the hand-computed mean of per-micro grads."""
    from flowmirror_hydravox_tpu.models import flow as flow_model
    from flowmirror_hydravox_tpu.train.steps import _value_and_grad_accum

    fcfg = tiny_config().flow
    params = flow_model.init_params(jax.random.PRNGKey(0), fcfg, jnp.float32)
    rng = jax.random.PRNGKey(5)
    b, lt = 4, 8
    key = jax.random.PRNGKey(3)
    batch = {
        "speech_token": jax.random.randint(key, (b, lt), 0, fcfg.vocab_size),
        "token_len": jnp.full((b,), lt, jnp.int32),
        "speech_feat": jax.random.normal(key, (b, 2 * lt, 80), jnp.float32),
        "feat_len": jnp.full((b,), 2 * lt, jnp.int32),
        "embedding": jax.random.normal(key, (b, 192), jnp.float32),
    }

    def loss_fn(p, mb, r):
        loss = flow_model.compute_loss(
            p, fcfg, r, mb["speech_token"], mb["token_len"],
            mb["speech_feat"], mb["feat_len"], mb["embedding"])
        return loss, jnp.float32(0.0)

    (loss, _), grads = jax.jit(
        lambda p, bt, r: _value_and_grad_accum(loss_fn, p, bt, 2, rng=r)
    )(params, batch, rng)

    rngs = jax.random.split(rng, 2)
    micro = jax.tree.map(lambda x: x.reshape(2, 2, *x.shape[1:]), batch)
    g_sum = None
    l_sum = 0.0
    for i in range(2):
        mb = jax.tree.map(lambda x: x[i], micro)
        (li, _), gi = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, rngs[i])
        l_sum += float(li)
        g_sum = gi if g_sum is None else jax.tree.map(jnp.add, g_sum, gi)
    want = jax.tree.map(lambda g: g / 2, g_sum)
    assert abs(float(loss) - l_sum / 2) < 1e-5
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         grads, want)
    assert max(jax.tree.leaves(diffs)) < 1e-5


def test_grad_accum_dpo_matches_full_batch():
    from flowmirror_hydravox_tpu.train.steps import dpo_train_step

    params = llm_model.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    ref = llm_model.init_params(jax.random.PRNGKey(9), CFG, jnp.float32)
    opt = make_optimizer(OptimConfig(learning_rate=1e-4, warmup_steps=1,
                                     total_steps=100))
    key = jax.random.PRNGKey(4)
    b, lt, ls = 4, 6, 10
    batch = {
        "text_token": jax.random.randint(key, (b, lt), 0, 200),
        "text_len": jnp.full((b,), lt, jnp.int32),
        "chosen_token": jax.random.randint(key, (b, ls), 0, CFG.speech_token_size),
        "chosen_len": jnp.full((b,), ls, jnp.int32),
        "rejected_token": jax.random.randint(
            jax.random.PRNGKey(7), (b, ls), 0, CFG.speech_token_size),
        "rejected_len": jnp.full((b,), ls, jnp.int32),
    }
    full = jax.jit(lambda s, rp, bt: dpo_train_step(s, rp, bt, CFG, opt))
    acc = jax.jit(lambda s, rp, bt: dpo_train_step(s, rp, bt, CFG, opt,
                                                   accum_steps=2))
    n1, m1 = full(init_state(params, opt), ref, batch)
    n2, m2 = acc(init_state(params, opt), ref, batch)
    for k in ("loss", "sft_loss", "dpo_loss", "dpo_acc"):
        assert abs(float(m1[k]) - float(m2[k])) < 1e-5, (k, m1[k], m2[k])
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         n1.params, n2.params)
    assert max(jax.tree.leaves(diffs)) < 2e-5
