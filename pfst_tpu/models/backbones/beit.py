"""BEiT / MAE backbones (mirror of ``rsiseg/models/backbones/beit.py``
and ``mae.py``).

Architecture-faithful rewrites — NOT plain-ViT aliases:

* attention carries a learned **relative position bias** over the
  full ``(Wh*Ww + 1)^2`` token grid including the cls-token rows
  (``beit.py:83-117``: the three extra table entries are
  cls→token / token→cls / cls→cls);
* q/v-only learnable bias (``bias='qv_bias'``, ``beit.py:126-130``:
  k bias frozen at zero);
* **layer scale**: per-channel ``gamma_1``/``gamma_2`` initialized to
  ``init_values`` multiply the attention/FFN branches
  (``beit.py:219-231``);
* stochastic depth (DropPath) on both residual branches with a
  linearly spaced rate schedule (``beit.py:365-368``).

MAE (``mae.py``) differs by: no q/v bias, a learned absolute
``pos_embed`` added after the cls token (``mae.py:125-129, 246``), and
zero-initialized relative-position tables (``mae.py:16-31``).

The relative-position index is a static numpy computation, so the
whole forward stays a single traced XLA program with static shapes.
The bias table is sized by ``img_size // patch_size``; inputs must
tile to exactly that grid (the reference has the same constraint —
it only resizes tables at checkpoint load).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import BACKBONES


@lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(Wh*Ww+1, Wh*Ww+1) int index into the bias table
    (``beit.py:83-117``), cls token in row/col 0."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing='ij'))          # (2, Wh, Ww)
    flat = coords.reshape(2, -1)                            # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, N, N)
    rel = rel.transpose(1, 2, 0).copy()                     # (N, N, 2)
    rel[..., 0] += wh - 1
    rel[..., 1] += ww - 1
    rel[..., 0] *= 2 * ww - 1
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    idx = np.zeros((wh * ww + 1, wh * ww + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, :] = num_rel - 3     # cls -> token
    idx[:, 0] = num_rel - 2     # token -> cls
    idx[0, 0] = num_rel - 1     # cls -> cls
    return idx


def drop_path(x, rate: float, deterministic: bool, rng):
    """Per-sample stochastic depth (reference DropPath)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class BEiTAttention(nn.Module):
    """W-MSA with relative position bias (``beit.py:27-152``)."""

    embed_dims: int
    num_heads: int
    window_size: Tuple[int, int]
    bias: Any = 'qv_bias'           # True | False | 'qv_bias'
    rel_pos_zero_init: bool = False  # MAE (``mae.py:23-31``)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        wh, ww = self.window_size
        if n != wh * ww + 1:
            raise ValueError(
                f'BEiT sequence length {n} != window {wh}x{ww}+1; set '
                f'img_size so the patch grid matches the input')
        hd = self.embed_dims // self.num_heads
        qkv = nn.Dense(self.embed_dims * 3, use_bias=(self.bias is True),
                       dtype=self.dtype, name='qkv')(x)
        if self.bias == 'qv_bias':
            q_bias = self.param('q_bias', nn.initializers.zeros,
                                (self.embed_dims,))
            v_bias = self.param('v_bias', nn.initializers.zeros,
                                (self.embed_dims,))
            qkv = qkv + jnp.concatenate(
                [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(
                    qkv.dtype)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd).transpose(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                          preferred_element_type=jnp.float32) * hd**-0.5

        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        init = (nn.initializers.zeros if self.rel_pos_zero_init
                else nn.initializers.truncated_normal(0.02))
        table = self.param('relative_position_bias_table', init,
                           (num_rel, self.num_heads))
        idx = jnp.asarray(relative_position_index(wh, ww))
        rel_bias = table[idx.reshape(-1)].reshape(
            n, n, self.num_heads).transpose(2, 0, 1)
        attn = jax.nn.softmax(attn + rel_bias[None].astype(attn.dtype),
                              axis=-1)
        o = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, self.embed_dims)
        return nn.Dense(self.embed_dims, dtype=self.dtype,
                        name='proj')(o.astype(self.dtype))


class BEiTBlock(nn.Module):
    """Pre-norm block with layer scale (``beit.py:155-231``):
    ``x += DropPath(gamma_1 * attn(norm1(x)))`` then the FFN branch."""

    embed_dims: int
    num_heads: int
    window_size: Tuple[int, int]
    mlp_ratio: int = 4
    bias: Any = 'qv_bias'
    init_values: float = 0.1
    drop_path_rate: float = 0.0
    rel_pos_zero_init: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        init = nn.initializers.constant(self.init_values)
        gamma_1 = self.param('gamma_1', init, (self.embed_dims,))
        gamma_2 = self.param('gamma_2', init, (self.embed_dims,))
        det = not train or self.drop_path_rate == 0.0
        rngs = (None, None) if det else (
            self.make_rng('dropout'), self.make_rng('dropout'))

        y = nn.LayerNorm(dtype=self.dtype, name='norm1')(x)
        y = BEiTAttention(self.embed_dims, self.num_heads,
                          self.window_size, bias=self.bias,
                          rel_pos_zero_init=self.rel_pos_zero_init,
                          dtype=self.dtype, name='attn')(y)
        x = x + drop_path(gamma_1 * y, self.drop_path_rate, det,
                          rngs[0])
        y = nn.LayerNorm(dtype=self.dtype, name='norm2')(x)
        y = nn.Dense(self.embed_dims * self.mlp_ratio, dtype=self.dtype,
                     name='fc1')(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.embed_dims, dtype=self.dtype, name='fc2')(y)
        return x + drop_path(gamma_2 * y, self.drop_path_rate, det,
                             rngs[1])


@BACKBONES.register_module()
class BEiT(nn.Module):
    """BERT pre-training of image transformers
    (``beit.py:233-552``)."""

    img_size: Union[int, Tuple[int, int]] = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    out_indices: Union[int, Sequence[int]] = -1
    qv_bias: bool = True
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    patch_norm: bool = False
    final_norm: bool = False
    norm_eval: bool = False
    init_values: float = 0.1
    interpolate_mode: str = 'bicubic'
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    num_fcs: int = 2
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32
    # MAE switches (``mae.py``)
    abs_pos_embed: bool = False
    rel_pos_zero_init: bool = False

    @property
    def window_size(self) -> Tuple[int, int]:
        s = self.img_size
        hw = (s, s) if isinstance(s, int) else tuple(s)
        return (hw[0] // self.patch_size, hw[1] // self.patch_size)

    def _out_indices(self):
        oi = self.out_indices
        if isinstance(oi, int):
            return [self.num_layers - 1 if oi == -1 else oi]
        return list(oi)

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                    dtype=self.dtype, name='patch_embed')(x)
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        cls_tok = self.param('cls_token', nn.initializers.zeros,
                             (1, 1, self.embed_dims))
        seq = jnp.concatenate([jnp.tile(cls_tok, (b, 1, 1)), seq],
                              axis=1)
        if self.abs_pos_embed:
            wh, ww = self.window_size
            pos = self.param('pos_embed',
                             nn.initializers.truncated_normal(0.02),
                             (1, wh * ww + 1, self.embed_dims))
            seq = seq + pos

        wh, ww = self.window_size
        if (h, w) != (wh, ww):
            raise ValueError(
                f'BEiT patch grid {(h, w)} != window {(wh, ww)}; the '
                f'relative-position tables are sized by img_size // '
                f'patch_size (reference constraint, beit.py:326-327)')
        dpr = np.linspace(0, self.drop_path_rate, self.num_layers)
        outs = []
        out_idx = self._out_indices()
        block_cls = (nn.remat(BEiTBlock, static_argnums=(2,))
                     if self.with_cp else BEiTBlock)
        for i in range(self.num_layers):
            seq = block_cls(
                self.embed_dims, self.num_heads, (wh, ww),
                mlp_ratio=self.mlp_ratio,
                bias=('qv_bias' if self.qv_bias else False),
                init_values=self.init_values,
                drop_path_rate=float(dpr[i]),
                rel_pos_zero_init=self.rel_pos_zero_init,
                dtype=self.dtype, name=f'layers_{i}')(seq, train)
            if i == self.num_layers - 1 and self.final_norm:
                seq = nn.LayerNorm(dtype=self.dtype, name='norm1')(seq)
            if i in out_idx:
                outs.append(seq[:, 1:].reshape(b, h, w, self.embed_dims))
        return tuple(outs)


@BACKBONES.register_module()
class MAE(BEiT):
    """MAE-pretrained ViT (``mae.py:46-262``): BEiT with absolute
    position embeddings, zero-init rel-pos tables, no q/v bias."""

    qv_bias: bool = False
    abs_pos_embed: bool = True
    rel_pos_zero_init: bool = True
