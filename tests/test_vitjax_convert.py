"""AugReg jax-ViT -> pfst_tpu converter parity
(``tools/model_converters/vitjax2pfst.py``, counterpart of the
reference ``vitjax2mmseg.py``).

Semantic check: an AugReg-style encoder twin built from
``nn.MultiHeadDotProductAttention`` (the module family the AugReg
checkpoints were trained with) is initialized, its params are
flattened to the ``.npz`` key schema, converted, loaded into our
``VisionTransformer``, and the forward outputs must match.  (GELU
follows the mmseg-lineage exact form on both sides — the mapping under
test is the weight layout, esp. the per-head -> fused-qkv reshapes.)
"""
import os.path as osp
import sys

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools',
                            'model_converters'))

from vitjax2pfst import convert_vit_jax  # noqa: E402

from pfst_tpu.models.builder import build_backbone  # noqa: E402

D, HEADS, LAYERS, PATCH, IMG = 16, 4, 2, 4, 16


class AugRegBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name='LayerNorm_0')(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=HEADS, name='MultiHeadDotProductAttention_1')(
                y, y)
        x = x + y
        z = nn.LayerNorm(name='LayerNorm_2')(x)
        z = nn.Dense(D * 4, name='fc1')(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(D, name='fc2')(z)
        return x + z


class AugRegEncoder(nn.Module):
    @nn.compact
    def __call__(self, img):
        x = nn.Conv(D, (PATCH, PATCH), strides=(PATCH, PATCH),
                    name='embedding')(img)
        b, h, w, _ = x.shape
        x = x.reshape(b, h * w, D)
        cls = self.param('cls', nn.initializers.normal(0.02), (1, 1, D))
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)
        pos = self.param('pos_embedding', nn.initializers.normal(0.02),
                         (1, h * w + 1, D))
        x = x + pos
        for i in range(LAYERS):
            x = AugRegBlock(name=f'encoderblock_{i}')(x)
        x = nn.LayerNorm(name='encoder_norm')(x)
        return x[:, 1:].reshape(b, h, w, D)


def _to_npz_schema(params):
    """Flatten the twin's params to the AugReg .npz key layout."""
    w = {}
    w['embedding/kernel'] = params['embedding']['kernel']
    w['embedding/bias'] = params['embedding']['bias']
    w['cls'] = params['cls']
    w['Transformer/posembed_input/pos_embedding'] = \
        params['pos_embedding']
    w['Transformer/encoder_norm/scale'] = \
        params['encoder_norm']['scale']
    w['Transformer/encoder_norm/bias'] = params['encoder_norm']['bias']
    for i in range(LAYERS):
        blk = params[f'encoderblock_{i}']
        jb = f'Transformer/encoderblock_{i}'
        for ln in ('LayerNorm_0', 'LayerNorm_2'):
            w[f'{jb}/{ln}/scale'] = blk[ln]['scale']
            w[f'{jb}/{ln}/bias'] = blk[ln]['bias']
        att = blk['MultiHeadDotProductAttention_1']
        for n in ('query', 'key', 'value', 'out'):
            w[f'{jb}/MultiHeadDotProductAttention_1/{n}/kernel'] = \
                att[n]['kernel']
            w[f'{jb}/MultiHeadDotProductAttention_1/{n}/bias'] = \
                att[n]['bias']
        w[f'{jb}/MlpBlock_3/Dense_0/kernel'] = blk['fc1']['kernel']
        w[f'{jb}/MlpBlock_3/Dense_0/bias'] = blk['fc1']['bias']
        w[f'{jb}/MlpBlock_3/Dense_1/kernel'] = blk['fc2']['kernel']
        w[f'{jb}/MlpBlock_3/Dense_1/bias'] = blk['fc2']['bias']
    # segmentation-irrelevant head tensors must be skipped
    w['head/kernel'] = np.zeros((D, 10), np.float32)
    w['head/bias'] = np.zeros((10,), np.float32)
    return w


def _merge(ref, new, path=''):
    out = {}
    for k, v in ref.items():
        if isinstance(v, dict):
            out[k] = _merge(v, new.get(k, {}), f'{path}/{k}')
        else:
            val = new.get(k)
            assert val is not None, f'unconverted {path}/{k}'
            assert np.asarray(val).shape == v.shape, (path, k)
            out[k] = jnp.asarray(val)
    return out


def test_vitjax_converter_forward_parity():
    twin = AugRegEncoder()
    img = jnp.asarray(
        np.random.RandomState(0).randn(2, IMG, IMG, 3), jnp.float32)
    tv = twin.init({'params': jax.random.PRNGKey(0)}, img)
    ref_out = np.asarray(twin.apply(tv, img))

    npz = _to_npz_schema(jax.device_get(tv['params']))
    converted, skipped = convert_vit_jax(npz, prefix=None)
    assert sorted(skipped) == ['head/bias', 'head/kernel']

    ours = build_backbone(dict(
        type='VisionTransformer', img_size=IMG, patch_size=PATCH,
        embed_dims=D, num_layers=LAYERS, num_heads=HEADS, mlp_ratio=4,
        out_indices=(LAYERS - 1,), drop_rate=0.0, final_norm=True))
    init = ours.init({'params': jax.random.PRNGKey(1)}, img)
    variables = {'params': _merge(jax.device_get(init['params']),
                                  converted)}
    out = np.asarray(ours.apply(variables, img)[-1])
    np.testing.assert_allclose(out, ref_out, atol=2e-5, rtol=1e-4)
