"""Environment collection (mirror of ``rsiseg/utils/collect_env.py`` —
the reference logs torch/CUDA build info at train start,
``tools/train.py:160-194``; here the equivalents are the JAX stack and
the TPU backend)."""
from __future__ import annotations

import sys
from collections import OrderedDict


def collect_env() -> 'OrderedDict[str, str]':
    env = OrderedDict()
    env['sys.platform'] = sys.platform
    env['Python'] = sys.version.replace('\n', '')
    for mod in ('jax', 'jaxlib', 'flax', 'optax', 'orbax.checkpoint',
                'numpy', 'cv2'):
        try:
            m = __import__(mod)
            for part in mod.split('.')[1:]:
                m = getattr(m, part)
            env[mod] = getattr(m, '__version__', 'unknown')
        except Exception:
            env[mod] = 'not available'
    try:
        import jax
        env['JAX backend'] = jax.default_backend()
        env['devices'] = ', '.join(
            f'{d.platform}:{d.id}' for d in jax.devices())
        env['process_count'] = str(jax.process_count())
    except Exception as e:
        env['JAX backend'] = f'unavailable ({e})'
    try:
        from pfst_tpu import __version__
        env['pfst_tpu'] = __version__
    except Exception:
        pass
    return env


def main():
    for name, val in collect_env().items():
        print(f'{name}: {val}')


if __name__ == '__main__':
    main()
