"""EncoderDecoder segmentor (flax.linen, NHWC).

TPU-native re-design of ``rsiseg/models/segmentors/encoder_decoder.py``:
the module is a pure function of (params, batch_stats, rngs); training
losses and inference post-processing are methods that trace cleanly
under ``jax.jit``.  Slide inference
(``encoder_decoder.py:220-263``) compiles to a single
``lax.fori_loop`` over a static window grid with on-device logit/count
accumulation — no host round-trips per window.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ...utils.misc import add_prefix
from ..builder import SEGMENTORS, build_backbone, build_head, build_loss, \
    build_neck
from ..losses.accuracy import accuracy


def _head_losses(head, loss_fns, seg_logit, seg_label, seg_weight=None):
    """Reference ``decode_head.py:249-283``: resize logits to label size,
    run each registered loss, add pixel accuracy; optional OHEM sampler
    overrides the pixel weight (``decode_head.py:258-259``)."""
    if hasattr(head, 'transform_targets'):
        # STDC boundary-target generation (``stdc_head.py:34-87``)
        seg_label = head.transform_targets(seg_label)
    # losses always run in fp32 (mixed-precision training keeps bf16
    # confined to the conv/matmul stack)
    seg_logit = resize(seg_logit.astype(jnp.float32),
                       size=seg_label.shape[1:3],
                       mode='bilinear', align_corners=head.align_corners)
    if getattr(head, 'sampler', None) is not None:
        from ...core.seg import build_pixel_sampler
        sampler = build_pixel_sampler(
            head.sampler, ignore_index=head.ignore_index)
        seg_weight = sampler.sample(seg_logit, seg_label)
    loss = {}
    for loss_fn in loss_fns:
        name = loss_fn.loss_name
        val = loss_fn(seg_logit, seg_label, weight=seg_weight,
                      ignore_index=head.ignore_index)
        loss[name] = loss[name] + val if name in loss else val
    loss['acc_seg'] = accuracy(seg_logit, seg_label,
                               ignore_index=head.ignore_index)
    return loss


@SEGMENTORS.register_module()
class EncoderDecoder(nn.Module):
    backbone: dict = None
    decode_head: dict = None
    neck: Optional[dict] = None
    auxiliary_head: Optional[Union[dict, Sequence[dict]]] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        backbone_cfg = dict(self.backbone)
        if self.pretrained is not None:
            backbone_cfg.setdefault('pretrained', self.pretrained)
        backbone_cfg['dtype'] = self.dtype
        self.backbone_mod = build_backbone(backbone_cfg)
        self.neck_mod = build_neck(
            {**self.neck, 'dtype': self.dtype}) if self.neck else None
        self.decode_head_mod = build_head(
            {**self.decode_head, 'dtype': self.dtype})
        aux = self.auxiliary_head
        if aux is None:
            self.aux_heads = ()
        elif isinstance(aux, (list, tuple)):
            self.aux_heads = tuple(
                build_head({**a, 'dtype': self.dtype}) for a in aux)
        else:
            self.aux_heads = (build_head({**aux, 'dtype': self.dtype}),)
        self._decode_losses = _build_losses(
            self.decode_head.get('loss_decode'))
        self._aux_losses = tuple(
            _build_losses((a if isinstance(aux, (list, tuple)) else aux)
                          .get('loss_decode'))
            for a in (aux if isinstance(aux, (list, tuple)) else
                      ([aux] if aux else [])))

    # -- properties mirrored from the reference -------------------------
    @property
    def align_corners(self):
        return self.decode_head.get('align_corners', False)

    @property
    def num_classes(self):
        return self.decode_head['num_classes']

    # -- forward pieces ---------------------------------------------------
    def extract_feat(self, img, train: bool = False):
        x = self.backbone_mod(img, train=train)
        if self.neck_mod is not None:
            x = self.neck_mod(x, train=train)
        return x

    def _decode_forward(self, feats, train: bool):
        """Run the decode head; heads with extra loss branches (DAHead
        pam/cam, ``da_head.py:157-178``) return >2 outputs — normalize
        to (logits, decoded, branch_logits)."""
        out = self.decode_head_mod(feats, train=train)
        return out[0], out[1], tuple(out[2:])

    def __call__(self, img, train: bool = False):
        """Full forward returning everything downstream consumers need."""
        feats = self.extract_feat(img, train=train)
        logits, decoded, branches = self._decode_forward(feats, train)
        aux_logits = tuple(
            h(feats, train=train)[0] for h in self.aux_heads)
        return {
            'feats': feats,
            'seg_logits': logits,           # head-resolution logits
            'decoded_features': decoded,
            'aux_logits': aux_logits,
            'branch_logits': branches,
        }

    def encode_decode(self, img, train: bool = False):
        """Logits resized to input size (+states) —
        ``encoder_decoder.py:72-84``."""
        feats = self.extract_feat(img, train=train)
        logits, decoded, _ = self._decode_forward(feats, train)
        out = resize(logits, size=img.shape[1:3], mode='bilinear',
                     align_corners=self.align_corners)
        states = {'feats': feats, 'decoded_features': decoded,
                  'seg_logits': out, 'head_logits': logits}
        return out, states

    def forward_train(self, img, gt_semantic_seg, seg_weight=None,
                      train: bool = True):
        """Losses + states for one supervised pass
        (``encoder_decoder.py:166-217``)."""
        losses = {}
        gt = gt_semantic_seg.astype(jnp.int32)
        dh = self.decode_head_mod
        if hasattr(dh, 'all_stage_logits'):
            # K-Net: losses on every refinement stage
            # (``knet_head.py:446-453``)
            feats = self.extract_feat(img, train=train)
            stage_segs, decoded = dh.all_stage_logits(feats,
                                                      train=train)
            out = {
                'feats': feats,
                'seg_logits': stage_segs[-1],
                'decoded_features': decoded,
                'aux_logits': tuple(
                    h(feats, train=train)[0] for h in self.aux_heads),
            }
            for i, logit in enumerate(stage_segs):
                stage = _head_losses(dh, self._decode_losses, logit,
                                     gt, seg_weight)
                losses.update(add_prefix(
                    {f'{k}.s{i}': v for k, v in stage.items()},
                    'decode'))
        elif getattr(dh, 'use_se_loss', False):
            # EncNet: the SE branch's image-level class-presence BCE
            # (``enc_head.py:126-127,179-186``) from the same forward
            feats = self.extract_feat(img, train=train)
            logits, decoded, se_logits = dh(feats, train=train,
                                            with_se=True)
            out = {
                'feats': feats,
                'seg_logits': logits,
                'decoded_features': decoded,
                'aux_logits': tuple(
                    h(feats, train=train)[0] for h in self.aux_heads),
            }
            losses.update(
                add_prefix(
                    _head_losses(dh, self._decode_losses, logits, gt,
                                 seg_weight), 'decode'))
            se_cfg = dict(dh.loss_se_decode or
                          dict(type='CrossEntropyLoss',
                               use_sigmoid=True, loss_weight=0.2))
            se_loss_fn = build_loss(se_cfg)
            onehot = dh.se_onehot_labels(gt)
            losses['decode.loss_se'] = se_loss_fn(
                se_logits.astype(jnp.float32), onehot)
        else:
            out = self(img, train=train)
            branch_names = getattr(dh, 'branch_loss_names', ())
            if branch_names and out.get('branch_logits'):
                # DAHead: three separate losses, keys
                # decode.pam_cam.* / decode.pam.* / decode.cam.*
                # (``da_head.py:166-178`` + add_prefix 'decode')
                primary = getattr(dh, 'primary_loss_name', 'primary')
                losses.update(add_prefix(
                    _head_losses(dh, self._decode_losses,
                                 out['seg_logits'], gt, seg_weight),
                    f'decode.{primary}'))
                for bname, blogit in zip(branch_names,
                                         out['branch_logits']):
                    losses.update(add_prefix(
                        _head_losses(dh, self._decode_losses, blogit,
                                     gt, seg_weight),
                        f'decode.{bname}'))
            else:
                losses.update(
                    add_prefix(
                        _head_losses(dh, self._decode_losses,
                                     out['seg_logits'], gt, seg_weight),
                        'decode'))
        if hasattr(dh, 'point_losses') and train:
            # PointRend train-time point loss
            # (``point_head.py:174-209``)
            pt_logits, pt_label = dh.point_losses(
                out['feats'], gt, coarse_logits=out['seg_logits'])
            pl = pt_logits[:, :, None, :]     # (B,N,1,K) spatial form
            lbl = pt_label[:, :, None]
            pt = {}
            for loss_fn in self._decode_losses:
                name = 'point' + loss_fn.loss_name
                val = loss_fn(pl, lbl, ignore_index=dh.ignore_index)
                pt[name] = pt[name] + val if name in pt else val
            pt['acc_point'] = accuracy(pl, lbl,
                                       ignore_index=dh.ignore_index)
            losses.update(add_prefix(pt, 'decode'))
        for i, (head, aux_logit) in enumerate(
                zip(self.aux_heads, out['aux_logits'])):
            prefix = 'aux' if len(self.aux_heads) == 1 else f'aux_{i}'
            losses.update(
                add_prefix(
                    _head_losses(head, self._aux_losses[i], aux_logit, gt,
                                 seg_weight), prefix))
        states = {
            'seg_logits': out['seg_logits'],
            'decoded_features': out['decoded_features'],
            'features': out['feats'],
        }
        return losses, states

    # -- inference --------------------------------------------------------
    def whole_inference(self, img, train: bool = False):
        logits, states = self.encode_decode(img, train=train)
        return logits, states

    def slide_inference(self, img, train: bool = False):
        """Overlap-averaged sliding-window logits
        (``encoder_decoder.py:220-263``), as one fori_loop."""
        test_cfg = self.test_cfg or {}
        h_crop, w_crop = test_cfg['crop_size']
        h_stride, w_stride = test_cfg['stride']
        b, h_img, w_img, _ = img.shape
        num_classes = self.num_classes
        h_crop, w_crop = min(h_crop, h_img), min(w_crop, w_img)
        h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
        w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1

        ys, xs = [], []
        for hi in range(h_grids):
            for wi in range(w_grids):
                y1 = min(hi * h_stride + h_crop, h_img) - h_crop
                x1 = min(wi * w_stride + w_crop, w_img) - w_crop
                ys.append(max(y1, 0))
                xs.append(max(x1, 0))
        ys = jnp.asarray(ys, jnp.int32)
        xs = jnp.asarray(xs, jnp.int32)

        def body(i, carry):
            preds, count = carry
            y1, x1 = ys[i], xs[i]
            crop = jax.lax.dynamic_slice(
                img, (0, y1, x1, 0), (b, h_crop, w_crop, img.shape[3]))
            logit, _ = self.encode_decode(crop, train=train)
            patch = jax.lax.dynamic_slice(
                preds, (0, y1, x1, 0), (b, h_crop, w_crop, num_classes))
            preds = jax.lax.dynamic_update_slice(
                preds, patch + logit, (0, y1, x1, 0))
            cpatch = jax.lax.dynamic_slice(
                count, (0, y1, x1, 0), (b, h_crop, w_crop, 1))
            count = jax.lax.dynamic_update_slice(
                count, cpatch + 1.0, (0, y1, x1, 0))
            return preds, count

        preds = jnp.zeros((b, h_img, w_img, num_classes), jnp.float32)
        count = jnp.zeros((b, h_img, w_img, 1), jnp.float32)
        preds, count = jax.lax.fori_loop(0, h_grids * w_grids, body,
                                         (preds, count))
        return preds / count, {}

    def inference_logits(self, img, train: bool = False):
        """Raw (pre-softmax) logits at input size, slide/whole per
        ``test_cfg.mode`` — the quantity the reference's ``inference``
        rescales BEFORE softmax (``encoder_decoder.py:284-310``); TTA
        view finalization consumes this so mixed-scale averaging
        matches the reference's resize-then-softmax order."""
        mode = (self.test_cfg or {}).get('mode', 'whole')
        if mode == 'slide':
            return self.slide_inference(img, train=train)
        return self.whole_inference(img, train=train)

    def inference(self, img, rescale_size=None, flip: bool = False,
                  flip_direction: str = 'horizontal', train: bool = False):
        """softmax probs with optional rescale + flip-undo
        (``encoder_decoder.py:284-327``)."""
        seg_logit, states = self.inference_logits(img, train=train)
        if rescale_size is not None and tuple(rescale_size) != \
                tuple(seg_logit.shape[1:3]):
            seg_logit = resize(seg_logit, size=rescale_size,
                               mode='bilinear',
                               align_corners=self.align_corners)
        output = jax.nn.softmax(seg_logit, axis=-1)
        if flip:
            dirs = flip_direction if isinstance(flip_direction, (list,
                                                                 tuple)) \
                else [flip_direction]
            for d in dirs:
                axis = 2 if d == 'horizontal' else 1
                output = jnp.flip(output, axis=axis)
        return output, states

    def simple_test_logits(self, img, train: bool = False):
        probs, states = self.inference(img, train=train)
        return jnp.argmax(probs, axis=-1), probs, states


def _build_losses(loss_cfg):
    if loss_cfg is None:
        loss_cfg = {'type': 'CrossEntropyLoss', 'use_sigmoid': False,
                    'loss_weight': 1.0}
    if isinstance(loss_cfg, (list, tuple)):
        return tuple(build_loss(c) for c in loss_cfg)
    return (build_loss(loss_cfg),)
