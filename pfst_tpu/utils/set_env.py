"""Process/environment setup (mirror of
``rsiseg/utils/set_env.py:11`` — the reference tunes multiprocessing
and OpenCV threads; the TPU equivalents are the persistent XLA
compilation cache and host-thread hygiene)."""
from __future__ import annotations

import os


def setup_environment(cfg=None, cache_dir: str | None = None):
    """Idempotent process setup; call early in every CLI entry."""
    import cv2
    # pipeline work happens in a thread pool; keep cv2 single-threaded
    # per call to avoid oversubscription (reference sets the same).
    try:
        cv2.setNumThreads(
            int(os.environ.get('OPENCV_NUM_THREADS', '0')) or 1)
    except Exception:
        pass

    import jax
    cache = cache_dir or os.environ.get(
        'JAX_COMPILATION_CACHE_DIR',
        os.path.expanduser('~/.cache/pfst_tpu_xla_cache'))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          2.0)
    except Exception:
        # older jax versions: cache flags unavailable — fine
        pass


# keep the reference's name importable
setup_multi_processes = setup_environment
