"""torch -> flax forward parity for the transformer backbones + the
checkpoint converter (reference ``tools/model_converters/*2mmseg.py``
workflows).

Each test builds an independent torch reference module whose
state-dict keys follow the mmseg naming used by reference
checkpoints, converts it with
``tools/convert_torch_checkpoint.convert_transformer_state_dict``,
and asserts the flax backbone reproduces the torch forward."""
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))
sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from convert_torch_checkpoint import (convert_transformer_state_dict,
                                      official_to_mmseg)
from pfst_tpu.models.builder import BACKBONES


def _merge(ref, new, path=''):
    out = {}
    for k, v in ref.items():
        if isinstance(v, dict):
            out[k] = _merge(v, new.get(k, {}), f'{path}/{k}')
        else:
            val = new.get(k)
            if val is None:
                raise AssertionError(f'missing converted leaf {path}/{k}')
            assert np.asarray(val).shape == v.shape, (
                f'{path}/{k}: {np.asarray(val).shape} != {v.shape}')
            out[k] = jnp.asarray(np.asarray(val, np.float32))
    return out


# --------------------------------------------------------------------
# torch reference modules (independent re-implementations of the
# reference math, with mmseg state-dict naming)

def _torch_rel_index(wh, ww):
    """(Wh*Ww+1)^2 relative position index (``beit.py:90-117``)."""
    coords = torch.stack(
        torch.meshgrid(torch.arange(wh), torch.arange(ww),
                       indexing='ij'))
    flat = torch.flatten(coords, 1)
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2,
                                                        0).contiguous()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    idx = torch.zeros((wh * ww + 1, wh * ww + 1), dtype=torch.long)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, :] = num_rel - 3
    idx[:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


class TorchBEiTAttn(nn.Module):
    def __init__(self, dim, heads, window, qv_bias=True):
        super().__init__()
        self.heads, self.window = heads, window
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        if qv_bias:
            self.q_bias = nn.Parameter(torch.zeros(dim))
            self.v_bias = nn.Parameter(torch.zeros(dim))
        else:
            self.q_bias = None
        wh, ww = window
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(num_rel, heads))
        self.register_buffer('relative_position_index',
                             _torch_rel_index(wh, ww))
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        if self.q_bias is not None:
            bias = torch.cat([self.q_bias,
                              torch.zeros_like(self.v_bias),
                              self.v_bias])
            qkv = F.linear(x, self.qkv.weight, bias)
        else:
            qkv = self.qkv(x)
        hd = c // self.heads
        qkv = qkv.reshape(b, n, 3, self.heads, hd).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd**-0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        rel = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(
                n, n, -1).permute(2, 0, 1)
        attn = (attn + rel.unsqueeze(0)).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class TorchBEiTBlock(nn.Module):
    def __init__(self, dim, heads, window, mlp_ratio=4, qv_bias=True,
                 init_values=0.1):
        super().__init__()
        self.ln1 = nn.LayerNorm(dim)
        self.attn = TorchBEiTAttn(dim, heads, window, qv_bias)
        self.ln2 = nn.LayerNorm(dim)
        self.ffn = nn.Module()
        self.ffn.layers = nn.Sequential(
            nn.Sequential(nn.Linear(dim, dim * mlp_ratio)),
            nn.Linear(dim * mlp_ratio, dim))
        self.gamma_1 = nn.Parameter(init_values * torch.ones(dim))
        self.gamma_2 = nn.Parameter(init_values * torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.ln1(x))
        y = self.ffn.layers[1](F.gelu(self.ffn.layers[0][0](
            self.ln2(x))))
        return x + self.gamma_2 * y


class TorchBEiT(nn.Module):
    def __init__(self, img=32, patch=8, dim=24, layers=2, heads=3,
                 qv_bias=True, abs_pos=False, final_norm=True):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.projection = nn.Conv2d(3, dim, patch, patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        w = img // patch
        self.window = (w, w)
        if abs_pos:
            self.pos_embed = nn.Parameter(
                torch.zeros(1, w * w + 1, dim))
        else:
            self.pos_embed = None
        self.layers = nn.ModuleList([
            TorchBEiTBlock(dim, heads, self.window, qv_bias=qv_bias)
            for _ in range(layers)])
        self.final = final_norm
        if final_norm:
            self.ln1 = nn.LayerNorm(dim)

    def forward(self, x):
        x = self.patch_embed.projection(x)
        b, c, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        if self.pos_embed is not None:
            x = x + self.pos_embed
        outs = []
        for i, blk in enumerate(self.layers):
            x = blk(x)
            if i == len(self.layers) - 1 and self.final:
                x = self.ln1(x)
            outs.append(x[:, 1:].reshape(b, h, w, c))
        return outs


def _randomize(m, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return m


@pytest.mark.parametrize('arch_flag', ['BEiT', 'MAE'])
def test_beit_mae_forward_parity(arch_flag):
    qv = arch_flag == 'BEiT'
    tm = _randomize(TorchBEiT(qv_bias=qv, abs_pos=not qv)).eval()
    sd = {k: v for k, v in tm.state_dict().items()}
    params, bs, skipped = convert_transformer_state_dict(sd, 'beit')
    assert not skipped, skipped

    bb = BACKBONES.build(dict(
        type=arch_flag, img_size=32, patch_size=8, embed_dims=24,
        num_layers=2, num_heads=3, out_indices=(0, 1),
        final_norm=True, init_values=0.1))
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    ref = bb.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(x),
                  train=False)
    variables = {'params': _merge(jax.device_get(ref['params']),
                                  params['backbone_mod'])}
    f_outs = bb.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        t_outs = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    for f, t in zip(f_outs, t_outs):
        np.testing.assert_allclose(np.asarray(f), t.numpy(),
                                   atol=2e-5, rtol=1e-4)


def test_beit_official_key_rename():
    """official BEiT naming (blocks./mlp.fc1/patch_embed.proj) maps via
    the official_to_mmseg pass (reference beit2mmseg.py)."""
    sd = {
        'patch_embed.proj.weight': 0, 'cls_token': 0,
        'blocks.0.norm1.weight': 0, 'blocks.0.attn.qkv.weight': 0,
        'blocks.0.attn.q_bias': 0, 'blocks.0.mlp.fc1.weight': 0,
        'blocks.0.mlp.fc2.bias': 0, 'blocks.0.gamma_1': 0,
    }
    out = official_to_mmseg(sd, 'beit')
    assert 'patch_embed.projection.weight' in out
    assert 'layers.0.ln1.weight' in out
    assert 'layers.0.attn.qkv.weight' in out
    assert 'layers.0.ffn.layers.0.0.weight' in out
    assert 'layers.0.ffn.layers.1.bias' in out
    assert 'layers.0.gamma_1' in out


# --------------------------------------------------------------------
# MiT (SegFormer) one stage

class TorchMiTStage(nn.Module):
    """mmseg MixVisionTransformer keys: layers.0.{0,1,2}."""

    def __init__(self, dim=16, heads=2, sr=2, patch=7, stride=4,
                 mlp_ratio=2):
        super().__init__()
        pe = nn.Module()
        pe.projection = nn.Conv2d(3, dim, patch, stride, patch // 2)
        pe.norm = nn.LayerNorm(dim)

        blk = nn.Module()
        blk.norm1 = nn.LayerNorm(dim)
        attn = nn.Module()
        attn.attn = nn.MultiheadAttention(dim, heads, batch_first=True)
        attn.sr = nn.Conv2d(dim, dim, sr, sr)
        attn.norm = nn.LayerNorm(dim)
        blk.attn = attn
        blk.norm2 = nn.LayerNorm(dim)
        ffn = nn.Module()
        hidden = dim * mlp_ratio
        ffn.layers = nn.Sequential(
            nn.Conv2d(dim, hidden, 1), nn.Conv2d(
                hidden, hidden, 3, 1, 1, groups=hidden),
            nn.GELU(), nn.Identity(), nn.Conv2d(hidden, dim, 1))
        blk.ffn = ffn
        self.layers = nn.ModuleList([nn.ModuleList(
            [pe, nn.ModuleList([blk]), nn.LayerNorm(dim)])])
        self.sr_ratio = sr

    def forward(self, x):
        pe, blocks, norm = self.layers[0]
        x = pe.projection(x)
        b, c, h, w = x.shape
        x = pe.norm(x.flatten(2).transpose(1, 2))
        for blk in blocks:
            y = blk.norm1(x)
            kv = y.transpose(1, 2).reshape(b, c, h, w)
            kv = blk.attn.sr(kv).flatten(2).transpose(1, 2)
            kv = blk.attn.norm(kv)
            att, _ = blk.attn.attn(y, kv, kv, need_weights=False)
            x = x + att
            y = blk.norm2(x)
            y2 = y.transpose(1, 2).reshape(b, c, h, w)
            y2 = blk.ffn.layers[0](y2)
            y2 = blk.ffn.layers[1](y2)
            y2 = F.gelu(y2)
            y2 = blk.ffn.layers[4](y2)
            x = x + y2.flatten(2).transpose(1, 2)
        x = norm(x)
        return x.reshape(b, h, w, c)


def test_mit_stage_forward_parity():
    tm = _randomize(TorchMiTStage(), seed=1).eval()
    sd = tm.state_dict()
    params, bs, skipped = convert_transformer_state_dict(sd, 'mit')
    assert not skipped, skipped

    # stage dim = embed_dims * num_heads[i] (mmseg convention) = 16
    bb = BACKBONES.build(dict(
        type='MixVisionTransformer', embed_dims=8, num_stages=1,
        num_layers=(1,), num_heads=(2,), patch_sizes=(7,),
        strides=(4,), sr_ratios=(2,), out_indices=(0,), mlp_ratio=2))
    x = np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32)
    ref = bb.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(x),
                  train=False)
    variables = {'params': _merge(jax.device_get(ref['params']),
                                  params['backbone_mod'])}
    f_out = bb.apply(variables, jnp.asarray(x), train=False)[0]
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    # float32 reassociation noise across ~10 matmuls; same budget as
    # the resnet golden test (2e-4)
    np.testing.assert_allclose(np.asarray(f_out), t_out,
                               atol=1e-4, rtol=1e-3)


# --------------------------------------------------------------------
# Swin / ViT: converter covers every backbone leaf with right shapes

def _leaf_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaf_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_swin_converter_covers_all_params():
    bb = BACKBONES.build(dict(
        type='SwinTransformer', pretrain_img_size=32, embed_dims=8,
        depths=(1, 1), num_heads=(1, 2), window_size=4,
        out_indices=(0, 1), patch_size=4, strides=(4, 2)))
    ref = bb.init({'params': jax.random.PRNGKey(0)},
                  jnp.zeros((1, 32, 32, 3)), train=False)
    ref_p = jax.device_get(ref['params'])

    # synthesize the matching mmseg state dict and round-trip it
    sd = {}
    dim0 = 8
    sd['patch_embed.projection.weight'] = torch.zeros(dim0, 3, 4, 4)
    sd['patch_embed.projection.bias'] = torch.zeros(dim0)
    sd['patch_embed.norm.weight'] = torch.zeros(dim0)
    sd['patch_embed.norm.bias'] = torch.zeros(dim0)
    for s, dim in ((0, 8), (1, 16)):
        p = f'stages.{s}.blocks.0.'
        nrel = (2 * 4 - 1)**2
        heads = 1 if s == 0 else 2
        sd[p + 'norm1.weight'] = torch.zeros(dim)
        sd[p + 'norm1.bias'] = torch.zeros(dim)
        sd[p + 'attn.w_msa.relative_position_bias_table'] = \
            torch.zeros(nrel, heads)
        sd[p + 'attn.w_msa.relative_position_index'] = \
            torch.zeros(16, 16)
        sd[p + 'attn.w_msa.qkv.weight'] = torch.zeros(dim * 3, dim)
        sd[p + 'attn.w_msa.qkv.bias'] = torch.zeros(dim * 3)
        sd[p + 'attn.w_msa.proj.weight'] = torch.zeros(dim, dim)
        sd[p + 'attn.w_msa.proj.bias'] = torch.zeros(dim)
        sd[p + 'norm2.weight'] = torch.zeros(dim)
        sd[p + 'norm2.bias'] = torch.zeros(dim)
        sd[p + 'ffn.layers.0.0.weight'] = torch.zeros(dim * 4, dim)
        sd[p + 'ffn.layers.0.0.bias'] = torch.zeros(dim * 4)
        sd[p + 'ffn.layers.1.weight'] = torch.zeros(dim, dim * 4)
        sd[p + 'ffn.layers.1.bias'] = torch.zeros(dim)
        sd[f'norm{s}.weight'] = torch.zeros(dim)
        sd[f'norm{s}.bias'] = torch.zeros(dim)
    sd['stages.0.downsample.norm.weight'] = torch.zeros(32)
    sd['stages.0.downsample.norm.bias'] = torch.zeros(32)
    sd['stages.0.downsample.reduction.weight'] = torch.zeros(16, 32)

    params, _, skipped = convert_transformer_state_dict(sd, 'swin')
    assert not skipped, skipped
    conv = params['backbone_mod']
    for path, leaf in _leaf_paths(ref_p):
        node = conv
        for k in path:
            assert k in node, f'converter missed {"/".join(path)}'
            node = node[k]
        assert np.asarray(node).shape == leaf.shape, path


def test_vit_converter_covers_all_params():
    bb = BACKBONES.build(dict(
        type='VisionTransformer', img_size=32, patch_size=8,
        embed_dims=16, num_layers=1, num_heads=2, out_indices=(0,),
        final_norm=True))
    ref = bb.init({'params': jax.random.PRNGKey(0)},
                  jnp.zeros((1, 32, 32, 3)), train=False)
    ref_p = jax.device_get(ref['params'])

    dim = 16
    sd = {
        'patch_embed.projection.weight': torch.zeros(dim, 3, 8, 8),
        'patch_embed.projection.bias': torch.zeros(dim),
        'cls_token': torch.zeros(1, 1, dim),
        'pos_embed': torch.zeros(1, 17, dim),
        'layers.0.ln1.weight': torch.zeros(dim),
        'layers.0.ln1.bias': torch.zeros(dim),
        'layers.0.attn.attn.in_proj_weight': torch.zeros(dim * 3, dim),
        'layers.0.attn.attn.in_proj_bias': torch.zeros(dim * 3),
        'layers.0.attn.attn.out_proj.weight': torch.zeros(dim, dim),
        'layers.0.attn.attn.out_proj.bias': torch.zeros(dim),
        'layers.0.ln2.weight': torch.zeros(dim),
        'layers.0.ln2.bias': torch.zeros(dim),
        'layers.0.ffn.layers.0.0.weight': torch.zeros(dim * 4, dim),
        'layers.0.ffn.layers.0.0.bias': torch.zeros(dim * 4),
        'layers.0.ffn.layers.1.weight': torch.zeros(dim, dim * 4),
        'layers.0.ffn.layers.1.bias': torch.zeros(dim),
        'ln1.weight': torch.zeros(dim),
        'ln1.bias': torch.zeros(dim),
    }
    params, _, skipped = convert_transformer_state_dict(sd, 'vit')
    assert not skipped, skipped
    conv = params['backbone_mod']
    for path, leaf in _leaf_paths(ref_p):
        node = conv
        for k in path:
            assert k in node, f'converter missed {"/".join(path)}'
            node = node[k]
        assert np.asarray(node).shape == leaf.shape, path


def test_swin_official_naming_detected_and_converted():
    """Official Swin releases name stages ``layers.N`` — exactly what
    mmseg renames to ``stages.N`` — so naming detection must be
    arch-aware (``layers.`` means OFFICIAL for swin, mmseg for vit)."""
    bb = BACKBONES.build(dict(
        type='SwinTransformer', pretrain_img_size=32, embed_dims=8,
        depths=(1, 1), num_heads=(1, 2), window_size=4,
        out_indices=(0, 1), patch_size=4, strides=(4, 2)))
    ref = bb.init({'params': jax.random.PRNGKey(0)},
                  jnp.zeros((1, 32, 32, 3)), train=False)
    ref_p = jax.device_get(ref['params'])

    sd = {}
    sd['patch_embed.proj.weight'] = torch.zeros(8, 3, 4, 4)
    sd['patch_embed.proj.bias'] = torch.zeros(8)
    sd['patch_embed.norm.weight'] = torch.zeros(8)
    sd['patch_embed.norm.bias'] = torch.zeros(8)
    for s, dim in ((0, 8), (1, 16)):
        p = f'layers.{s}.blocks.0.'
        nrel = (2 * 4 - 1)**2
        heads = 1 if s == 0 else 2
        sd[p + 'norm1.weight'] = torch.zeros(dim)
        sd[p + 'norm1.bias'] = torch.zeros(dim)
        sd[p + 'attn.relative_position_bias_table'] = \
            torch.zeros(nrel, heads)
        sd[p + 'attn.relative_position_index'] = torch.zeros(16, 16)
        sd[p + 'attn.qkv.weight'] = torch.zeros(dim * 3, dim)
        sd[p + 'attn.qkv.bias'] = torch.zeros(dim * 3)
        sd[p + 'attn.proj.weight'] = torch.zeros(dim, dim)
        sd[p + 'attn.proj.bias'] = torch.zeros(dim)
        sd[p + 'norm2.weight'] = torch.zeros(dim)
        sd[p + 'norm2.bias'] = torch.zeros(dim)
        sd[p + 'mlp.fc1.weight'] = torch.zeros(dim * 4, dim)
        sd[p + 'mlp.fc1.bias'] = torch.zeros(dim * 4)
        sd[p + 'mlp.fc2.weight'] = torch.zeros(dim, dim * 4)
        sd[p + 'mlp.fc2.bias'] = torch.zeros(dim)
        sd[f'norm{s}.weight'] = torch.zeros(dim)
        sd[f'norm{s}.bias'] = torch.zeros(dim)
    sd['layers.0.downsample.norm.weight'] = torch.zeros(32)
    sd['layers.0.downsample.norm.bias'] = torch.zeros(32)
    sd['layers.0.downsample.reduction.weight'] = torch.zeros(16, 32)
    sd['head.weight'] = torch.zeros(1000, 16)  # dropped

    params, _, skipped = convert_transformer_state_dict(sd, 'swin')
    assert not skipped, skipped
    conv = params['backbone_mod']
    for path, leaf in _leaf_paths(ref_p):
        node = conv
        for k in path:
            assert k in node, f'converter missed {"/".join(path)}'
            node = node[k]
        assert np.asarray(node).shape == leaf.shape, path


def test_swin_patch_merging_unfold_order_correction():
    """mmseg-layout PatchMerging weights (mmcv nn.Unfold channel
    order) are permuted to this repo's position-major merge concat;
    official-layout weights pass through untouched."""
    from convert_torch_checkpoint import (_unfold_to_official_mat,
                                          _unfold_to_official_vec)

    C = 3
    # encode (position p in official order, channel c) uniquely
    official = np.array([p * 10 + c for p in range(4)
                         for c in range(C)], np.float32)
    # the same values laid out like mmcv's Unfold: index = c*4 + p_rm,
    # where official positions (0,0),(1,0),(0,1),(1,1) have row-major
    # window indices [0, 2, 1, 3]
    mmcv = np.zeros(12, np.float32)
    for p_official, p_rm in enumerate([0, 2, 1, 3]):
        for c in range(C):
            mmcv[c * 4 + p_rm] = p_official * 10 + c
    np.testing.assert_array_equal(_unfold_to_official_vec(mmcv),
                                  official)
    # matrix form: each input column carries its official index
    w_mmcv = np.tile(mmcv[None, :], (5, 1))
    w_official = np.tile(official[None, :], (5, 1))
    np.testing.assert_array_equal(_unfold_to_official_mat(w_mmcv),
                                  w_official)

    # end-to-end: the mmseg-named dict (mmcv layout) and the official
    # dict (position-major) converge to the same flax kernel
    sd_off = {'layers.0.downsample.reduction.weight':
              torch.from_numpy(w_official)}
    sd_mmseg = {'stages.0.downsample.reduction.weight':
                torch.from_numpy(w_mmcv)}
    p_off, _, _ = convert_transformer_state_dict(sd_off, 'swin')
    p_mm, _, _ = convert_transformer_state_dict(sd_mmseg, 'swin')
    np.testing.assert_array_equal(
        np.asarray(p_off['backbone_mod']['merge_reduce1']['kernel']),
        np.asarray(p_mm['backbone_mod']['merge_reduce1']['kernel']))
