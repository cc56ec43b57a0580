"""Installable package + optional native extension build.

`pip install -e .` installs the Python package; the native RIR tracer
shared library builds on demand via soundspaces_tpu.tools.rir_synth
(plain g++, no pybind11)."""

from setuptools import find_packages, setup

setup(
    name="soundspaces-tpu",
    version="0.1.0",
    description=(
        "TPU-native audio-visual embodied-AI platform: spatial-audio "
        "rendering, AudioGoal navigation tasks, and PPO baselines in JAX"
    ),
    packages=find_packages(include=["soundspaces_tpu", "soundspaces_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "scipy",
        "pyyaml",
    ],
    extras_require={
        "test": ["pytest", "chex"],
        "viz": ["opencv-python", "tensorboardX"],
    },
    package_data={"": ["../csrc/*.cpp"]},
)
