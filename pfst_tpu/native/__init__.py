"""Native (C++) host-side components.

The TPU compute path is jax/XLA; these are the *host runtime* pieces
where C++ beats the numpy/cv2 composition — currently the data-loader
photometric kernel (``hostaug``).  Every native kernel has a pure
cv2/numpy fallback that is the behavioural reference and is used
automatically when the toolchain or the built library is unavailable
(``PFST_NATIVE=0`` forces the fallback).
"""
from . import hostaug  # noqa: F401
