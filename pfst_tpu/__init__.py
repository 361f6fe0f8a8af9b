"""PFST-TPU: TPU-native satellite-image segmentation + self-training.

A ground-up JAX/Flax/Pallas re-build of the capabilities of
zhu-xlab/PFST (mmsegmentation-fork ``rsiseg``): DeepLabV3+ semantic
segmentation of remote-sensing imagery with unsupervised domain
adaptation via EMA-teacher self-training and pseudo-features guided
neighborhood-similarity losses.
"""
from .version import __version__, version_info

__all__ = ['__version__', 'version_info']
