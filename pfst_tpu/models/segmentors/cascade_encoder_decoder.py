"""CascadeEncoderDecoder (mirror of mmseg's
``cascade_encoder_decoder.py``, used by the reference's
``ocrnet_*.py`` and ``pointrend_r50.py`` model defs).

``decode_head`` is a LIST of stage configs: stage 0 runs on the
backbone features alone, every later stage additionally receives the
previous stage's logits (``prev_logits``) — the FCN→OCR and
FPN→PointRend cascades. Losses carry mmseg's ``decode_0.``/
``decode_1.`` prefixes; inference uses the LAST stage's logits.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ...utils import add_prefix
from ..builder import (SEGMENTORS, build_backbone, build_head,
                       build_neck)
from ..losses import accuracy
from .encoder_decoder import EncoderDecoder, _build_losses, _head_losses


@SEGMENTORS.register_module()
class CascadeEncoderDecoder(EncoderDecoder):
    num_stages: int = 2

    def setup(self):
        assert isinstance(self.decode_head, (list, tuple)), \
            'CascadeEncoderDecoder wants a list of decode_head cfgs'
        assert len(self.decode_head) == self.num_stages
        backbone_cfg = dict(self.backbone)
        if self.pretrained is not None:
            backbone_cfg.setdefault('pretrained', self.pretrained)
        backbone_cfg['dtype'] = self.dtype
        self.backbone_mod = build_backbone(backbone_cfg)
        self.neck_mod = build_neck(
            {**self.neck, 'dtype': self.dtype}) if self.neck else None
        self.stage_heads = tuple(
            build_head({**h, 'dtype': self.dtype})
            for h in self.decode_head)
        aux = self.auxiliary_head
        if aux is None:
            self.aux_heads = ()
        elif isinstance(aux, (list, tuple)):
            self.aux_heads = tuple(
                build_head({**a, 'dtype': self.dtype}) for a in aux)
        else:
            self.aux_heads = (build_head({**aux, 'dtype': self.dtype}),)
        self._stage_losses = tuple(
            _build_losses(h.get('loss_decode'))
            for h in self.decode_head)
        self._aux_losses = tuple(
            _build_losses((a if isinstance(aux, (list, tuple)) else aux)
                          .get('loss_decode'))
            for a in (aux if isinstance(aux, (list, tuple)) else
                      ([aux] if aux else [])))

    @property
    def align_corners(self):
        return self.decode_head[-1].get('align_corners', False)

    @property
    def num_classes(self):
        return self.decode_head[-1]['num_classes']

    # -- forward pieces ---------------------------------------------------
    def _cascade(self, feats, train: bool):
        """Run all stages; returns (stage_logits list, last decoded)."""
        logits, decoded = self.stage_heads[0](feats, train=train)
        stage_logits = [logits]
        for head in self.stage_heads[1:]:
            logits, decoded = head(feats, train=train,
                                   prev_logits=logits)
            stage_logits.append(logits)
        return stage_logits, decoded

    def __call__(self, img, train: bool = False):
        feats = self.extract_feat(img, train=train)
        stage_logits, decoded = self._cascade(feats, train)
        aux_logits = tuple(
            h(feats, train=train)[0] for h in self.aux_heads)
        return {
            'feats': feats,
            'seg_logits': stage_logits[-1],
            'stage_logits': stage_logits,
            'decoded_features': decoded,
            'aux_logits': aux_logits,
        }

    def encode_decode(self, img, train: bool = False):
        feats = self.extract_feat(img, train=train)
        stage_logits, decoded = self._cascade(feats, train)
        out = resize(stage_logits[-1], size=img.shape[1:3],
                     mode='bilinear', align_corners=self.align_corners)
        states = {'feats': feats, 'decoded_features': decoded,
                  'seg_logits': out, 'head_logits': stage_logits[-1]}
        return out, states

    def forward_train(self, img, gt_semantic_seg, seg_weight=None,
                      train: bool = True):
        losses = {}
        gt = gt_semantic_seg.astype(jnp.int32)
        out = self(img, train=train)
        for i, (head, logits) in enumerate(
                zip(self.stage_heads, out['stage_logits'])):
            if hasattr(head, 'point_losses') and train:
                # PointRend cascade stage: the stage loss IS the
                # sampled point loss on the previous stage's coarse
                # logits (``point_head.py:174-209``)
                pt_logits, pt_label = head.point_losses(
                    out['feats'], gt,
                    coarse_logits=out['stage_logits'][i - 1])
                pl = pt_logits[:, :, None, :]
                lbl = pt_label[:, :, None]
                pt = {}
                for loss_fn in self._stage_losses[i]:
                    name = 'point' + loss_fn.loss_name
                    val = loss_fn(pl, lbl,
                                  ignore_index=head.ignore_index)
                    pt[name] = pt[name] + val if name in pt else val
                pt['acc_point'] = accuracy(
                    pl, lbl, ignore_index=head.ignore_index)
                losses.update(add_prefix(pt, f'decode_{i}'))
                continue
            losses.update(
                add_prefix(
                    _head_losses(head, self._stage_losses[i], logits,
                                 gt, seg_weight), f'decode_{i}'))
        for i, (head, aux_logit) in enumerate(
                zip(self.aux_heads, out['aux_logits'])):
            prefix = 'aux' if len(self.aux_heads) == 1 else f'aux_{i}'
            losses.update(
                add_prefix(
                    _head_losses(head, self._aux_losses[i], aux_logit,
                                 gt, seg_weight), prefix))
        states = {
            'seg_logits': out['seg_logits'],
            'decoded_features': out['decoded_features'],
            'features': out['feats'],
        }
        return losses, states
