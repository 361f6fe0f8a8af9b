from setuptools import find_packages, setup


def get_version():
    scope = {}
    with open('pfst_tpu/version.py') as f:
        exec(f.read(), scope)
    return scope['__version__']


setup(
    name='pfst-tpu',
    version=get_version(),
    description='TPU-native satellite-image segmentation and '
                'pseudo-features guided self-training (JAX/Flax/Pallas)',
    packages=find_packages(exclude=('tests', 'tools', 'configs')),
    python_requires='>=3.10',
    install_requires=[
        'jax', 'flax', 'optax', 'orbax-checkpoint', 'numpy',
        'opencv-python-headless', 'h5py',
    ],
    license='Apache License 2.0',
)
