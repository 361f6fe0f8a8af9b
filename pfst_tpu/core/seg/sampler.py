"""Pixel samplers (mirror of ``rsiseg/core/seg/sampler/``).

``OHEMPixelSampler`` (``ohem_pixel_sampler.py:11-85``): hard-pixel
mining for the CE loss.  With ``thresh`` set, pixels whose gt-class
probability is below max(thresh, kth-smallest prob) are kept; otherwise
the ``min_kept_per_image`` highest-loss pixels are kept.  Fixed-shape
top-k on TPU replaces the boolean sort-and-slice.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.registry import Registry

PIXEL_SAMPLERS = Registry('pixel sampler')


def build_pixel_sampler(cfg, **default_args):
    return PIXEL_SAMPLERS.build(dict(cfg), **default_args)


class BasePixelSampler:

    def sample(self, seg_logit, seg_label):
        raise NotImplementedError


@PIXEL_SAMPLERS.register_module()
class OHEMPixelSampler(BasePixelSampler):

    def __init__(self, context=None, thresh: Optional[float] = None,
                 min_kept: int = 100000, ignore_index: int = 255):
        assert min_kept > 1
        self.context = context
        self.thresh = thresh
        self.min_kept = min_kept
        self.ignore_index = ignore_index

    def sample(self, seg_logit, seg_label):
        """seg_logit NHWC, seg_label (B,H,W) -> weight (B,H,W)."""
        b, h, w, c = seg_logit.shape
        valid = seg_label != self.ignore_index
        safe = jnp.where(valid, seg_label, 0).astype(jnp.int32)
        n_px = h * w
        kept = min(self.min_kept, n_px)

        if self.thresh is not None:
            probs = jax.nn.softmax(seg_logit.astype(jnp.float32),
                                   axis=-1)
            gt_prob = jnp.take_along_axis(probs, safe[..., None],
                                          axis=-1)[..., 0]
            gt_prob = jnp.where(valid, gt_prob, 1.0)

            def per_image(p, v):
                # sort VALID probs only (ignored pixels pushed to the
                # end as +inf) and clamp the kept-index into the valid
                # range, mirroring mmseg's
                # ``sort_prob[min(batch_kept, numel - 1)]`` — indexing
                # into the invalid tail would yield threshold 1.0 and
                # keep every pixel whenever #valid < min_kept
                vf = v.reshape(-1)
                flat = jnp.where(vf, p.reshape(-1), jnp.inf)
                sort_p = jnp.sort(flat)
                nv = jnp.sum(vf.astype(jnp.int32))
                k = jnp.clip(jnp.minimum(kept, nv - 1), 0, n_px - 1)
                min_thr = jnp.where(nv > 0, sort_p[k], 0.0)
                threshold = jnp.maximum(min_thr, self.thresh)
                return (p < threshold)

            sel = jax.vmap(per_image)(gt_prob, valid)
            return (sel & valid).astype(jnp.float32)

        # loss-based: keep the min_kept highest-CE pixels
        logp = jax.nn.log_softmax(seg_logit.astype(jnp.float32), axis=-1)
        losses = -jnp.take_along_axis(logp, safe[..., None],
                                      axis=-1)[..., 0]
        losses = jnp.where(valid, losses, -jnp.inf)

        def per_image(l):
            flat = l.reshape(-1)
            kth = jnp.sort(flat)[n_px - kept]
            return l >= kth

        sel = jax.vmap(per_image)(losses)
        return (sel & valid).astype(jnp.float32)
