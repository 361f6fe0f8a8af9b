"""Parity tests for the native host-augmentation kernels.

The C++ kernel (``pfst_tpu/native/hostaug.cc``) must reproduce
OpenCV's uint8 HSV arithmetic bit-exactly; these tests enforce that
EXHAUSTIVELY — the full 2^24 BGR cube for BGR->HSV and the full
180*256*256 HSV cube for HSV->BGR — so any deviation from this
machine's cv2 build fails loudly rather than skewing augmentation
statistics.

Also covers: the fused ``hsv_modify`` vs the 3-step cv2 path, and the
LUT-composed ``_Photometric._apply`` vs a literal re-implementation of
the pre-LUT float chain (reference
``rsiseg/datasets/pipelines/transforms.py:943-1060`` semantics) under
identical RNG streams, with the native path both on and off.

Width contract: cv2's HSV->BGR is INTERNALLY inconsistent — its SIMD
main loop (32 px/iter here) truncates the final x*255 while its
scalar tail rounds, so cv2 disagrees with *itself* by +/-1 on the
tail pixels of any row whose width is not a multiple of 32
(``test_cv2_simd_width_contract`` demonstrates this).  The native
kernel uniformly implements the SIMD behaviour, hence bit-exactness
is asserted on width-multiple-of-32 images — which covers every
shipped crop size (512^2, 1024^2).
"""
import cv2
import numpy as np
import pytest

from pfst_tpu.native import hostaug
from pfst_tpu.datasets.pipelines.transforms import (
    PhotoMetricDistortion, _Photometric, _hsv_modify)

requires_native = pytest.mark.skipif(
    not hostaug.available(), reason='native hostaug unavailable')


def _full_bgr_cube():
    idx = np.arange(256 ** 3, dtype=np.uint32)
    img = np.empty((256 ** 3, 3), np.uint8)
    img[:, 0] = idx & 255
    img[:, 1] = (idx >> 8) & 255
    img[:, 2] = (idx >> 16) & 255
    return img.reshape(4096, 4096, 3)


def _full_hsv_cube():
    idx = np.arange(180 * 256 * 256, dtype=np.uint32)
    img = np.empty((180 * 256 * 256, 3), np.uint8)
    img[:, 0] = idx // (256 * 256)          # H in [0, 180)
    img[:, 1] = (idx >> 8) & 255            # S
    img[:, 2] = idx & 255                   # V
    return img.reshape(180 * 256, 256, 3)


@requires_native
def test_bgr2hsv_exhaustive():
    img = _full_bgr_cube()
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    got = hostaug.bgr2hsv(img)
    assert np.array_equal(got, ref)


@requires_native
def test_hsv2bgr_exhaustive():
    img = _full_hsv_cube()
    ref = cv2.cvtColor(img, cv2.COLOR_HSV2BGR)
    got = hostaug.hsv2bgr(img)
    assert np.array_equal(got, ref)


def _cv2_hsv_modify(img, sat_lut=None, hue_lut=None):
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    if sat_lut is not None:
        hsv[:, :, 1] = sat_lut[hsv[:, :, 1]]
    if hue_lut is not None:
        hsv[:, :, 0] = hue_lut[hsv[:, :, 0]]
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


@requires_native
@pytest.mark.parametrize('with_sat,with_hue', [
    (True, False), (False, True), (True, True), (False, False)])
def test_hsv_modify_fused_matches_cv2(with_sat, with_hue):
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (64, 96, 3), np.uint8)
    sat_lut = np.clip(np.arange(256) * 1.37, 0, 255).astype(np.uint8) \
        if with_sat else None
    hue_lut = ((np.arange(256) + 11) % 180).astype(np.uint8) \
        if with_hue else None
    got = hostaug.hsv_modify(img, sat_lut, hue_lut)
    ref = _cv2_hsv_modify(img, sat_lut, hue_lut)
    assert np.array_equal(got, ref)


@requires_native
def test_hsv_modify_noncontiguous_input():
    rng = np.random.RandomState(3)
    big = rng.randint(0, 256, (64, 64, 3), np.uint8)
    view = big[8:40, 4:60]          # non-contiguous
    sat_lut = np.clip(np.arange(256) * 0.6, 0, 255).astype(np.uint8)
    assert np.array_equal(
        hostaug.hsv_modify(view, sat_lut, None),
        hostaug.hsv_modify(np.ascontiguousarray(view), sat_lut, None))


@requires_native
def test_cv2_simd_width_contract():
    """Native == cv2 at width % 32 == 0; for other widths cv2's own
    scalar tail rounds (vs SIMD truncation) so exactness cannot hold
    for ANY single implementation."""
    rng = np.random.RandomState(11)
    for w in (32, 64, 96, 128, 512):
        img = rng.randint(0, 256, (50, w, 3), np.uint8)
        img[:, :, 0] %= 180
        assert np.array_equal(hostaug.hsv2bgr(img),
                              cv2.cvtColor(img, cv2.COLOR_HSV2BGR)), w
    # document the cv2 self-inconsistency that motivates the contract:
    # same pixels, 2D (w=56, has SIMD tail) vs one long row (pure SIMD)
    img = rng.randint(0, 256, (32, 56, 3), np.uint8)
    img[:, :, 0] %= 180
    a = cv2.cvtColor(img, cv2.COLOR_HSV2BGR).reshape(-1, 3)
    b = cv2.cvtColor(img.reshape(1, -1, 3),
                     cv2.COLOR_HSV2BGR).reshape(-1, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def _float_photometric_apply(pm, img):
    """Literal pre-LUT float implementation of ``_Photometric._apply``
    (the behaviour the LUT rewrite must reproduce bit-exactly,
    identical RNG draw order)."""
    def convert(img, alpha=1, beta=0):
        img = img.astype(np.float32) * alpha + beta
        return np.clip(img, 0, 255).astype(np.uint8)

    if np.random.randint(2):
        img = convert(img, beta=np.random.uniform(-pm.brightness_delta,
                                                  pm.brightness_delta))
    mode = np.random.randint(2)
    if mode == 1:
        if np.random.randint(2):
            img = convert(img, alpha=np.random.uniform(
                pm.contrast_lower, pm.contrast_upper))
    if np.random.randint(2):
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        hsv[:, :, 1] = convert(
            hsv[:, :, 1], alpha=np.random.uniform(pm.saturation_lower,
                                                  pm.saturation_upper))
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    if np.random.randint(2):
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        hsv[:, :, 0] = (hsv[:, :, 0].astype(int) +
                        np.random.randint(-pm.hue_delta,
                                          pm.hue_delta)) % 180
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    if mode == 0:
        if np.random.randint(2):
            img = convert(img, alpha=np.random.uniform(
                pm.contrast_lower, pm.contrast_upper))
    return img


@pytest.mark.parametrize('native', [True, False])
def test_photometric_lut_matches_float_chain(native, monkeypatch):
    if native and not hostaug.available():
        pytest.skip('native hostaug unavailable')
    monkeypatch.setenv('PFST_NATIVE_HSV', '1' if native else '0')
    pm = PhotoMetricDistortion()
    base = np.random.RandomState(0).randint(0, 256, (48, 96, 3),
                                            np.uint8)
    for seed in range(24):       # cover all gate combinations
        np.random.seed(seed)
        ref = _float_photometric_apply(pm, base.copy())
        np.random.seed(seed)
        got = pm._apply(base.copy())
        assert np.array_equal(got, ref), f'seed {seed}'


def test_default_cv2_path_matches_native(monkeypatch):
    """The default (cv2 + 3-channel LUT) and the opt-in native kernel
    agree bit-exactly at shipped widths."""
    if not hostaug.available():
        pytest.skip('native hostaug unavailable')
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (33, 64, 3), np.uint8)
    sat_lut = np.clip(np.arange(256) * 1.2 + 3, 0, 255).astype(np.uint8)
    hue_lut = ((np.arange(256) + 170) % 180).astype(np.uint8)
    monkeypatch.setenv('PFST_NATIVE_HSV', '1')
    native = _hsv_modify(img, sat_lut, hue_lut)
    monkeypatch.setenv('PFST_NATIVE_HSV', '0')
    default = _hsv_modify(img, sat_lut, hue_lut)
    assert np.array_equal(native, default)


def test_apply_lut_u8():
    if not hostaug.available():
        pytest.skip('native hostaug unavailable')
    rng = np.random.RandomState(1)
    src = rng.randint(0, 256, (17, 5, 3), np.uint8)
    lut = rng.permutation(256).astype(np.uint8)
    out = np.empty_like(src)
    hostaug._load().apply_lut_u8(
        hostaug._u8p(src), hostaug._u8p(out), src.size,
        hostaug._u8p(lut))
    assert np.array_equal(out, lut[src])
