"""Minimal PyTorch DiT oracle for numeric parity testing.

The reference DiT (cosyvoice/flow/DiT/{dit.py,modules.py}) imports
x_transformers, which is not in this image, so it cannot be instantiated
directly.  This file re-states the reference math in ~130 lines of plain
torch, module-for-module:

  - SinusPositionEmbedding + TimestepEmbedding (modules.py:69-83, 606-616)
  - InputEmbedding + CausalConvPositionEmbedding (dit.py:76-98,
    modules.py:115-144): proj -> two left-padded grouped convs + Mish, +res
  - x_transformers rotary: freqs interleave-duplicated, applied to the FLAT
    (b, n, heads*dim_head) q/k, rotating only the first dim_head channels
    (x_transformers.x_transformers.apply_rotary_pos_emb semantics as called
    from modules.py:368-373) — the partial-rotary quirk under test
  - DiTBlock with AdaLayerNormZero / gates / GELU-tanh FF
    (modules.py:230-265, 414-436, 500-530)
  - AdaLayerNormZero_Final (scale first) + proj_out (modules.py:254-265)

Only used by tests/test_ref_parity.py.
"""

import math

import torch
from torch import nn
import torch.nn.functional as F


def rotate_half_interleaved(x):
    # x_transformers rotate_half: '... (d r) -> ... d r', r=2
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return torch.stack((-x2, x1), dim=-1).reshape(*x1.shape[:-1], -1)


def apply_rotary_pos_emb_flat(t, freqs):
    """x_transformers.apply_rotary_pos_emb with scale=1: rotate the first
    rot_dim channels of the flat tensor, pass the rest through."""
    rot_dim = freqs.shape[-1]
    tr, tu = t[..., :rot_dim], t[..., rot_dim:]
    tr = (tr * freqs.cos()) + (rotate_half_interleaved(tr) * freqs.sin())
    return torch.cat((tr, tu), dim=-1)


def rotary_freqs(seq_len, dim_head, theta=10000.0):
    """x_transformers RotaryEmbedding.forward_from_seq_len: (T, dim_head)
    with each frequency duplicated into interleaved pairs."""
    inv = 1.0 / (theta ** (torch.arange(0, dim_head, 2).float() / dim_head))
    f = torch.outer(torch.arange(seq_len).float(), inv)  # (T, dim_head/2)
    return torch.stack((f, f), dim=-1).reshape(seq_len, dim_head)


class MiniTimestepEmbedding(nn.Module):
    def __init__(self, dim, freq_embed_dim=256):
        super().__init__()
        self.freq_embed_dim = freq_embed_dim
        self.time_mlp = nn.Sequential(
            nn.Linear(freq_embed_dim, dim), nn.SiLU(), nn.Linear(dim, dim))

    def forward(self, t):
        half = self.freq_embed_dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half).float() * -emb)
        ang = 1000.0 * t.unsqueeze(1) * emb.unsqueeze(0)
        return self.time_mlp(torch.cat((ang.sin(), ang.cos()), dim=-1))


class MiniCausalConvPos(nn.Module):
    def __init__(self, dim, kernel_size=31, groups=16):
        super().__init__()
        self.k = kernel_size
        self.conv1 = nn.Conv1d(dim, dim, kernel_size, groups=groups, padding=0)
        self.conv2 = nn.Conv1d(dim, dim, kernel_size, groups=groups, padding=0)

    def forward(self, x):  # (B, T, D)
        h = x.permute(0, 2, 1)
        h = F.mish(self.conv1(F.pad(h, (self.k - 1, 0))))
        h = F.mish(self.conv2(F.pad(h, (self.k - 1, 0))))
        return h.permute(0, 2, 1)


class MiniDiTBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, ff_mult):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        inner = heads * dim_head
        self.attn_norm_linear = nn.Linear(dim, dim * 6)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.to_q = nn.Linear(dim, inner)
        self.to_k = nn.Linear(dim, inner)
        self.to_v = nn.Linear(dim, inner)
        self.to_out = nn.Linear(inner, dim)
        self.ff_norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff_in = nn.Linear(dim, dim * ff_mult)
        self.ff_out = nn.Linear(dim * ff_mult, dim)

    def forward(self, x, t_emb, attn_mask, freqs):
        b, n, _ = x.shape
        mod = self.attn_norm_linear(F.silu(t_emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mod.chunk(6, dim=1)
        norm = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        q = apply_rotary_pos_emb_flat(self.to_q(norm), freqs)
        k = apply_rotary_pos_emb_flat(self.to_k(norm), freqs)
        v = self.to_v(norm)
        q = q.view(b, n, self.heads, self.dim_head).transpose(1, 2)
        k = k.view(b, n, self.heads, self.dim_head).transpose(1, 2)
        v = v.view(b, n, self.heads, self.dim_head).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
        o = o.transpose(1, 2).reshape(b, n, -1)
        x = x + gate_msa.unsqueeze(1) * self.to_out(o)
        ffn = self.ff_norm(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        ff = self.ff_out(F.gelu(self.ff_in(ffn), approximate="tanh"))
        return x + gate_mlp.unsqueeze(1) * ff


class MiniDiT(nn.Module):
    """Reference DiT.forward (dit.py:145-176) on the mini modules."""

    def __init__(self, dim, depth, heads, dim_head, ff_mult, mel_dim, mu_dim,
                 spk_dim, freq_embed_dim=256, static_chunk_size=50):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        self.static_chunk_size = static_chunk_size
        self.time_embed = MiniTimestepEmbedding(dim, freq_embed_dim)
        self.input_proj = nn.Linear(mel_dim * 2 + mu_dim + spk_dim, dim)
        self.conv_pos = MiniCausalConvPos(dim)
        self.blocks = nn.ModuleList(
            [MiniDiTBlock(dim, heads, dim_head, ff_mult) for _ in range(depth)])
        self.norm_out_linear = nn.Linear(dim, dim * 2)
        self.norm_out = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = nn.Linear(dim, mel_dim)

    def forward(self, x, mask, mu, t, spks, cond, streaming=False):
        x = x.transpose(1, 2)
        mu = mu.transpose(1, 2)
        cond = cond.transpose(1, 2)
        b, n, _ = x.shape
        t_emb = self.time_embed(t)
        spk_bc = spks.unsqueeze(1).expand(b, n, spks.shape[-1])
        h = self.input_proj(torch.cat([x, cond, mu, spk_bc], dim=-1))
        h = self.conv_pos(h) + h
        freqs = rotary_freqs(n, self.dim_head)
        valid = mask[:, 0, :] > 0
        attn = valid[:, None, :] & valid[:, :, None]
        if streaming:
            idx = torch.arange(n)
            qc = idx[:, None] // self.static_chunk_size
            kc = idx[None, :] // self.static_chunk_size
            attn = attn & (kc <= qc)[None]
        attn_mask = attn[:, None, :, :]
        for blk in self.blocks:
            h = blk(h, t_emb, attn_mask, freqs)
        mod = self.norm_out_linear(F.silu(t_emb))
        scale, shift = mod.chunk(2, dim=1)  # scale first (modules.py:262)
        h = self.norm_out(h) * (1 + scale[:, None]) + shift[:, None]
        return self.proj_out(h).transpose(1, 2)
