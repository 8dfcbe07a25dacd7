"""GPipe pipeline parallelism (parallel/pipeline.py): the stage-sharded,
ppermute-scheduled backbone must match the single-program forward, backward,
and full train step to float tolerance on the 8-virtual-CPU mesh.

Beyond-parity feature — the reference scales training only by DDP
(SURVEY.md §2.13); there is no reference oracle, so the stock single-program
step is the oracle.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmirror_hydravox_tpu.config import tiny_config
from flowmirror_hydravox_tpu.models import llm, qwen2
from flowmirror_hydravox_tpu.parallel import pipeline
from flowmirror_hydravox_tpu.train import steps
from flowmirror_hydravox_tpu.train.steps import OptimConfig

CFG0 = tiny_config().llm
# 4 layers so a 4-stage pipeline has one layer per stage and a 2-stage one
# has two (exercises the within-stage layer loop)
CFG_BB = dataclasses.replace(CFG0.backbone, num_layers=4)
CFG = dataclasses.replace(CFG0, backbone=CFG_BB)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pipeline.make_pp_mesh(stages=4, data=2)


@pytest.fixture(scope="module")
def backbone_params():
    return qwen2.init_params(jax.random.PRNGKey(0), CFG_BB, jnp.float32)


def _inputs(b=8, t=16):
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, CFG_BB.hidden_size), jnp.float32)
    lens = jnp.asarray([t, t - 4, t - 7, t, 5, t, 7, t - 2][:b], jnp.int32)
    return x, lens


@pytest.mark.quick
def test_pipeline_forward_matches_stock(mesh, backbone_params):
    x, lens = _inputs()
    ref = qwen2.forward(backbone_params, CFG_BB, x, lens, unroll=True)
    for micro in (2, 4):
        out = pipeline.pipeline_forward(
            backbone_params, CFG_BB, x, lens, mesh, microbatches=micro)
        assert float(jnp.max(jnp.abs(ref - out))) < 1e-5, micro


def test_pipeline_backward_matches_stock(mesh, backbone_params):
    x, lens = _inputs()

    def loss_ref(p):
        return jnp.mean(qwen2.forward(p, CFG_BB, x, lens, unroll=True) ** 2)

    def loss_pp(p):
        return jnp.mean(
            pipeline.pipeline_forward(p, CFG_BB, x, lens, mesh, microbatches=4) ** 2)

    g_ref = jax.grad(loss_ref)(backbone_params)
    g_pp = jax.grad(loss_pp)(backbone_params)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g_ref, g_pp)
    assert max(jax.tree.leaves(diffs)) < 1e-6


def test_pp_train_step_matches_plain(mesh):
    params = llm.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    opt = steps.make_optimizer(OptimConfig())
    rng = np.random.default_rng(0)
    batch = {
        "text_token": jnp.asarray(rng.integers(0, 100, (8, 12)), jnp.int32),
        "text_len": jnp.full((8,), 12, jnp.int32),
        "speech_token": jnp.asarray(rng.integers(0, 50, (8, 24)), jnp.int32),
        "speech_len": jnp.full((8,), 24, jnp.int32),
    }
    st_ref = steps.init_state(params, opt)
    st_ref, m = steps.llm_train_step(st_ref, batch, CFG, opt)

    placed = jax.device_put(params, pipeline.pp_param_shardings(mesh, params))
    st_pp = steps.init_state(placed, opt)
    step_pp = pipeline.make_pp_llm_step(mesh, CFG, opt, microbatches=2)
    st_pp, p = step_pp(st_pp, batch)

    assert abs(float(m["loss"]) - float(p["loss"])) < 1e-4
    assert abs(float(m["grad_norm"]) - float(p["grad_norm"])) < 1e-4
    assert abs(float(m["acc"]) - float(p["acc"])) < 1e-6
    # layer stack stays stage-sharded through the optimizer update
    spec = st_pp.params["backbone"]["layers"]["q_proj_w"].sharding.spec
    assert spec == jax.sharding.PartitionSpec("stage")
    # updated params match the plain step's
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
        st_ref.params, jax.device_get(st_pp.params))
    assert max(jax.tree.leaves(d)) < 1e-5


# The --pipeline_parallel CLI path is covered in test_train_cli.py
# (test_llm_cli_pp_matches_replicated) with the shared dataset fixtures.
