"""Process/environment setup (mirror of
``rsiseg/utils/set_env.py:11`` — the reference tunes multiprocessing
and OpenCV threads; the TPU equivalents are the persistent XLA
compilation cache and host-thread hygiene)."""
from __future__ import annotations

import os


def tune_malloc() -> bool:
    """glibc buffer reuse for the data path (PFST_MALLOC_TUNE=0 opts
    out).  Measured on this VM class (PERF.md): fresh anonymous pages
    fault in at ~35 MB/s (hypervisor-backed first touch), so per-batch
    mmap/munmap churn — worker-thread arenas freeing 3 MB sample
    arrays back to the OS — causes recurring multi-second collate
    stalls (batch 16: stall batches of 3-11 s).  Capping arenas and
    raising the mmap/trim thresholds keeps the big buffers in the heap
    and reused: median 1.03 -> 0.86 s/batch, worst batch 10.9 -> 1.3 s.
    """
    if os.environ.get('PFST_MALLOC_TUNE', '1') == '0':
        return False
    if getattr(tune_malloc, '_done', False):
        return True
    try:
        import ctypes
        libc = ctypes.CDLL('libc.so.6', use_errno=True)
        # one arena on 1-core hosts (the measured optimum); a few on
        # real multi-core hosts to bound allocation-lock contention
        arenas = max(1, min(4, os.cpu_count() or 1))
        libc.mallopt(-8, arenas)     # M_ARENA_MAX
        libc.mallopt(-3, 1 << 30)    # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)    # M_TRIM_THRESHOLD
        tune_malloc._done = True
        return True
    except Exception:
        return False


def setup_environment(cfg=None, cache_dir: str | None = None):
    """Idempotent process setup; call early in every CLI entry."""
    tune_malloc()
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
