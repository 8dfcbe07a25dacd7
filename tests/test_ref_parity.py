"""Numeric parity against the ACTUAL reference PyTorch modules.

These tests import the read-only reference at /root/reference (skipped when
absent), randomly initialize its torch modules, convert the state dicts with
convert/torch_import, and require our JAX outputs to match within the
BASELINE tolerance band (<= 1e-3).  The deterministic paths are compared
exactly; stochastic inputs (NSF source noise) are computed once and fed to
both sides.
"""

import sys

import numpy as np
import pytest

REF = "/root/reference/server/model_utils"


def _ref_available():
    import os

    return os.path.isdir(REF)


pytestmark = pytest.mark.skipif(not _ref_available(), reason="reference not mounted")

if _ref_available() and REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def test_hift_decode_parity(torch):
    """Reference HiFTGenerator.decode vs models/hift.decode: same mel + same
    source -> same waveform (deterministic path; generator.py:507-539)."""
    import jax
    import jax.numpy as jnp

    from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor
    from cosyvoice.hifigan.generator import HiFTGenerator

    from flowmirror_hydravox_tpu.config import HiFTConfig
    from flowmirror_hydravox_tpu.convert.torch_import import hift_from_state_dict
    from flowmirror_hydravox_tpu.models import hift as hift_jax

    cfg = HiFTConfig()  # 24 kHz: rates (8,5,3), kernels (16,11,7)
    torch.manual_seed(0)
    ref = HiFTGenerator(
        in_channels=80, base_channels=512, nb_harmonics=8, sampling_rate=24000,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        istft_params={"n_fft": 16, "hop_len": 4},
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        source_resblock_kernel_sizes=list(cfg.source_resblock_kernel_sizes),
        source_resblock_dilation_sizes=[list(d) for d in cfg.source_resblock_dilation_sizes],
        f0_predictor=ConvRNNF0Predictor(),
    ).eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, hift_from_state_dict(sd, cfg))

    rng = np.random.default_rng(0)
    t_mel = 12
    mel = (rng.standard_normal((1, 80, t_mel)) * 0.5).astype(np.float32)
    source = (rng.standard_normal((1, 1, t_mel * cfg.upsample_scale)) * 0.05).astype(np.float32)

    with torch.no_grad():
        want = ref.decode(torch.from_numpy(mel), torch.from_numpy(source)).numpy()
    got = np.asarray(hift_jax.decode(params, cfg, jnp.asarray(mel), jnp.asarray(source)))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_hift_f0_predictor_parity(torch):
    from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor

    import jax
    import jax.numpy as jnp

    from flowmirror_hydravox_tpu.config import HiFTConfig
    from flowmirror_hydravox_tpu.convert.torch_import import merge_weight_norm
    from flowmirror_hydravox_tpu.models import hift as hift_jax

    torch.manual_seed(1)
    ref = ConvRNNF0Predictor().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    f0p = {
        "convs": [
            {"w": merge_weight_norm(sd, f"condnet.{2 * i}"), "b": sd[f"condnet.{2 * i}.bias"]}
            for i in range(5)
        ],
        "classifier": {"w": sd["classifier.weight"].T, "b": sd["classifier.bias"]},
    }
    params = {"f0_predictor": jax.tree.map(jnp.asarray, f0p)}

    mel = (np.random.default_rng(2).standard_normal((1, 80, 20)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mel)).numpy()
    got = np.asarray(hift_jax.predict_f0(params, jnp.asarray(mel)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_rel_pos_attention_parity(torch):
    """Reference RelPositionMultiHeadedAttention + EspnetRelPositionalEncoding
    vs our conformer _rel_attention with converted weights."""
    import jax
    import jax.numpy as jnp

    from cosyvoice.transformer.attention import RelPositionMultiHeadedAttention
    from cosyvoice.transformer.embedding import EspnetRelPositionalEncoding

    from flowmirror_hydravox_tpu.models import conformer as cf

    torch.manual_seed(3)
    d_model, heads, t = 64, 4, 10
    attn = RelPositionMultiHeadedAttention(heads, d_model, dropout_rate=0.0).eval()
    pos_enc = EspnetRelPositionalEncoding(d_model, dropout_rate=0.0)

    x = torch.randn(2, t, d_model) * 0.3
    with torch.no_grad():
        x_scaled, pos_emb = pos_enc(x)  # x * sqrt(d), (1, 2T-1, D)
        mask = torch.ones(2, 1, t, dtype=torch.bool)
        want, _ = attn(x_scaled, x_scaled, x_scaled, mask=mask, pos_emb=pos_emb)
    want = want.numpy()

    sd = {k: v.detach().numpy() for k, v in attn.state_dict().items()}
    layer = {
        "attn_q": {"w": sd["linear_q.weight"].T, "b": sd["linear_q.bias"]},
        "attn_k": {"w": sd["linear_k.weight"].T, "b": sd["linear_k.bias"]},
        "attn_v": {"w": sd["linear_v.weight"].T, "b": sd["linear_v.bias"]},
        "attn_out": {"w": sd["linear_out.weight"].T, "b": sd["linear_out.bias"]},
        "linear_pos": {"w": sd["linear_pos.weight"].T},
        "pos_bias_u": sd["pos_bias_u"],
        "pos_bias_v": sd["pos_bias_v"],
    }
    layer = jax.tree.map(jnp.asarray, layer)

    xj = jnp.asarray(x_scaled.numpy())
    pe = jnp.asarray(cf.espnet_rel_pos(t, d_model))
    pos_proj = (pe @ layer["linear_pos"]["w"]).reshape(2 * t - 1, heads, d_model // heads)
    attn_mask = jnp.ones((2, t, t), bool)
    got = np.asarray(cf._rel_attention(layer, xj, pos_proj, attn_mask, heads))
    # sanity: our espnet pe must equal the reference pos_emb
    np.testing.assert_allclose(np.asarray(pe), pos_emb.numpy()[0], atol=1e-5)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_conv_module_parity(torch):
    """Reference ConvolutionModule (layer_norm variant) vs our _conv_module."""
    import jax
    import jax.numpy as jnp

    from cosyvoice.transformer.convolution import ConvolutionModule

    from flowmirror_hydravox_tpu.models import conformer as cf
    from flowmirror_hydravox_tpu.models.conformer import ConformerConfig

    torch.manual_seed(4)
    d, kernel = 64, 15
    ref = ConvolutionModule(d, kernel, torch.nn.SiLU(), norm="layer_norm", causal=False).eval()

    x = torch.randn(2, 9, d) * 0.3
    with torch.no_grad():
        want, _ = ref(x)
    want = want.numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    layer = {
        "conv_pw1": {"w": sd["pointwise_conv1.weight"], "b": sd["pointwise_conv1.bias"]},
        "conv_dw": {"w": sd["depthwise_conv.weight"], "b": sd["depthwise_conv.bias"]},
        "conv_ln": {"g": sd["norm.weight"], "b": sd["norm.bias"]},
        "conv_pw2": {"w": sd["pointwise_conv2.weight"], "b": sd["pointwise_conv2.bias"]},
    }
    layer = jax.tree.map(jnp.asarray, layer)
    pad_mask = jnp.ones((2, 9), bool)
    got = np.asarray(
        cf._conv_module(layer, jnp.asarray(x.numpy()), pad_mask, kernel, causal=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def _stub_modules():
    """Stub torchaudio/omegaconf so the reference encoder modules import
    (they only need them at type-annotation/feature-extraction level)."""
    import importlib.machinery
    import types

    for name in ["torchaudio", "omegaconf", "torchaudio.compliance",
                 "torchaudio.compliance.kaldi"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    if not hasattr(sys.modules["omegaconf"], "DictConfig"):
        sys.modules["omegaconf"].DictConfig = dict


def test_pre_lookahead_layer_parity(torch):
    """Reference PreLookaheadLayer (upsample_encoder.py:66-105) vs the flow's
    pre_lookahead implementation, with and without streaming context."""
    _stub_modules()
    import jax
    import jax.numpy as jnp

    from cosyvoice.transformer.upsample_encoder import PreLookaheadLayer

    from flowmirror_hydravox_tpu.config import FlowConfig
    from flowmirror_hydravox_tpu.models import flow as flow_jax

    torch.manual_seed(5)
    c, la, t = 32, 3, 11
    ref = PreLookaheadLayer(in_channels=c, channels=c, pre_lookahead_len=la).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "pre_lookahead_conv1": {"w": jnp.asarray(sd["conv1.weight"]),
                                "b": jnp.asarray(sd["conv1.bias"])},
        "pre_lookahead_conv2": {"w": jnp.asarray(sd["conv2.weight"]),
                                "b": jnp.asarray(sd["conv2.bias"])},
    }
    cfg = FlowConfig(input_size=c, pre_lookahead_len=la)

    x = torch.randn(1, t, c) * 0.3
    with torch.no_grad():
        want = ref(x).numpy()
    got = np.asarray(flow_jax.pre_lookahead(params, cfg, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)

    # streaming: context tokens appended instead of zero right-pad
    ctx = torch.randn(1, la, c) * 0.3
    with torch.no_grad():
        want_s = ref(x, context=ctx).numpy()
    got_s = np.asarray(
        flow_jax.pre_lookahead(params, cfg, jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()))
    )
    np.testing.assert_allclose(got_s, want_s, atol=1e-4, rtol=1e-3)


def test_conformer_encoder_layer_parity(torch):
    """Full ConformerEncoderLayer (macaron + rel-attn + conv + ff + final LN,
    encoder_layer.py:109-236) vs our _conformer_layer with converted weights."""
    _stub_modules()
    import jax
    import jax.numpy as jnp

    from cosyvoice.transformer.attention import RelPositionMultiHeadedAttention
    from cosyvoice.transformer.convolution import ConvolutionModule
    from cosyvoice.transformer.embedding import EspnetRelPositionalEncoding
    from cosyvoice.transformer.encoder_layer import ConformerEncoderLayer
    from cosyvoice.transformer.positionwise_feed_forward import PositionwiseFeedForward

    from flowmirror_hydravox_tpu.models import conformer as cf
    from flowmirror_hydravox_tpu.models.conformer import ConformerConfig

    torch.manual_seed(6)
    d, heads, t, ffd, kernel = 64, 4, 9, 128, 15
    act = torch.nn.SiLU()
    ref = ConformerEncoderLayer(
        d,
        RelPositionMultiHeadedAttention(heads, d, 0.0),
        PositionwiseFeedForward(d, ffd, 0.0, act),
        PositionwiseFeedForward(d, ffd, 0.0, act),
        ConvolutionModule(d, kernel, act, norm="layer_norm", causal=False),
        dropout_rate=0.0,
        normalize_before=True,
    ).eval()
    pos_enc = EspnetRelPositionalEncoding(d, dropout_rate=0.0)

    x = torch.randn(2, t, d) * 0.3
    with torch.no_grad():
        x_scaled, pos_emb = pos_enc(x)
        mask = torch.ones(2, t, t, dtype=torch.bool)
        mask_pad = torch.ones(2, 1, t, dtype=torch.bool)
        want, *_ = ref(x_scaled, mask, pos_emb, mask_pad)
    want = want.numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def lin(name):
        return {"w": sd[name + ".weight"].T, "b": sd[name + ".bias"]}

    def ln(name):
        return {"g": sd[name + ".weight"], "b": sd[name + ".bias"]}

    layer = {
        "norm_mha": ln("norm_mha"),
        "attn_q": lin("self_attn.linear_q"),
        "attn_k": lin("self_attn.linear_k"),
        "attn_v": lin("self_attn.linear_v"),
        "attn_out": lin("self_attn.linear_out"),
        "linear_pos": {"w": sd["self_attn.linear_pos.weight"].T},
        "pos_bias_u": sd["self_attn.pos_bias_u"],
        "pos_bias_v": sd["self_attn.pos_bias_v"],
        "norm_ff": ln("norm_ff"),
        "ff_in": lin("feed_forward.w_1"),
        "ff_out": lin("feed_forward.w_2"),
        "norm_ff_macaron": ln("norm_ff_macaron"),
        "ff_mac_in": lin("feed_forward_macaron.w_1"),
        "ff_mac_out": lin("feed_forward_macaron.w_2"),
        "norm_conv": ln("norm_conv"),
        "norm_final": ln("norm_final"),
        "conv_pw1": {"w": sd["conv_module.pointwise_conv1.weight"],
                     "b": sd["conv_module.pointwise_conv1.bias"]},
        "conv_dw": {"w": sd["conv_module.depthwise_conv.weight"],
                    "b": sd["conv_module.depthwise_conv.bias"]},
        "conv_ln": {"g": sd["conv_module.norm.weight"], "b": sd["conv_module.norm.bias"]},
        "conv_pw2": {"w": sd["conv_module.pointwise_conv2.weight"],
                     "b": sd["conv_module.pointwise_conv2.bias"]},
    }
    layer = jax.tree.map(jnp.asarray, layer)

    cfg = ConformerConfig(
        input_size=d, output_size=d, attention_heads=heads, linear_units=ffd,
        cnn_module_kernel=kernel, macaron_style=True, use_cnn_module=True,
    )
    pe = jnp.asarray(cf.espnet_rel_pos(t, d))
    pos_proj = (pe @ layer["linear_pos"]["w"]).reshape(2 * t - 1, heads, d // heads)
    got = np.asarray(
        cf._conformer_layer(
            layer, jnp.asarray(x_scaled.numpy()), pos_proj,
            jnp.ones((2, t, t), bool), jnp.ones((2, t), bool), cfg,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_dit_estimator_parity(torch):
    """models/dit.py vs a local torch re-statement of the reference DiT math
    (tests/torch_mini_dit.py; the real module imports x_transformers, absent
    here).  Covers the partial-rotary quirk (only head 0 rotated, interleaved
    pairs), AdaLN-Zero gates, causal conv position embedding, the final
    scale-first modulation, and the streaming chunk mask
    (DiT/modules.py:289-536, dit.py:145-176)."""
    import jax
    import jax.numpy as jnp

    from flowmirror_hydravox_tpu.config import DiTConfig
    from flowmirror_hydravox_tpu.models import dit as dit_jax
    from torch_mini_dit import MiniDiT

    cfg = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                    mel_dim=8, mu_dim=12, spk_dim=6, freq_embed_dim=32,
                    static_chunk_size=5)
    torch.manual_seed(0)
    ref = MiniDiT(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=8,
                  mu_dim=12, spk_dim=6, freq_embed_dim=32, static_chunk_size=5)
    ref.eval()

    def lin(mod):
        return {"w": jnp.asarray(mod.weight.detach().numpy().T),
                "b": jnp.asarray(mod.bias.detach().numpy())}

    def conv(mod):
        return {"w": jnp.asarray(mod.weight.detach().numpy()),
                "b": jnp.asarray(mod.bias.detach().numpy())}

    blocks = [{
        "attn_norm_linear": lin(b.attn_norm_linear),
        "to_q": lin(b.to_q), "to_k": lin(b.to_k), "to_v": lin(b.to_v),
        "to_out": lin(b.to_out), "ff_in": lin(b.ff_in), "ff_out": lin(b.ff_out),
    } for b in ref.blocks]
    params = {
        "time_mlp_in": lin(ref.time_embed.time_mlp[0]),
        "time_mlp_out": lin(ref.time_embed.time_mlp[2]),
        "input_proj": lin(ref.input_proj),
        "conv_pos1": conv(ref.conv_pos.conv1),
        "conv_pos2": conv(ref.conv_pos.conv2),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm_out_linear": lin(ref.norm_out_linear),
        "proj_out": lin(ref.proj_out),
    }

    rng = np.random.default_rng(0)
    b, t_len = 2, 12
    x = rng.standard_normal((b, 8, t_len)).astype(np.float32)
    mu = rng.standard_normal((b, 12, t_len)).astype(np.float32)
    cond = rng.standard_normal((b, 8, t_len)).astype(np.float32)
    spks = rng.standard_normal((b, 6)).astype(np.float32)
    tt = np.asarray([0.3, 0.8], np.float32)
    mask = np.ones((b, 1, t_len), np.float32)
    mask[1, :, 9:] = 0.0  # padded row: compare valid region only

    for streaming in (False, True):
        with torch.no_grad():
            ref_out = ref(torch.as_tensor(x), torch.as_tensor(mask),
                          torch.as_tensor(mu), torch.as_tensor(tt),
                          torch.as_tensor(spks), torch.as_tensor(cond),
                          streaming=streaming).numpy()
        out = np.asarray(dit_jax.forward(
            params, cfg, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(mu),
            jnp.asarray(tt), jnp.asarray(spks), jnp.asarray(cond),
            streaming=streaming, unroll=False))
        np.testing.assert_allclose(out[0], ref_out[0], atol=1e-3)
        np.testing.assert_allclose(out[1, :, :9], ref_out[1, :, :9], atol=1e-3)
