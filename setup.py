"""Package setup (reference: safe_rl_envs/setup.py:1-13 packages the env
suite; here the whole framework is one installable package)."""

from setuptools import find_packages, setup

setup(
    name='guardx_tpu',
    version='0.1.0',
    description='TPU-native safe reinforcement-learning framework '
                '(GUARD environment suite + safe-RL trainer suite on '
                'JAX/XLA/Pallas)',
    packages=find_packages(include=['guardx_tpu', 'guardx_tpu.*']),
    package_data={'guardx_tpu.envs': ['xmls/*.xml']},
    python_requires='>=3.10',
    install_requires=[
        'jax', 'flax', 'optax', 'orbax-checkpoint', 'numpy', 'mujoco',
    ],
    entry_points={
        'console_scripts': [
            'guardx-train=guardx_tpu.train:main',
        ],
    },
)
