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
