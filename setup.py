#!/usr/bin/env python
"""Package setup (role of the reference's setup.py:16-152 — without the
CppExtension/CUDAExtension build: every op here is a jittable JAX function)."""

from setuptools import find_packages, setup

setup(
    name="fsgd_tpu",
    version="0.1.0",
    description="TPU-native detection framework (Full-Scale Gambler edition)",
    packages=find_packages(exclude=("tests", "tools", "demo", "configs")),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "pyyaml",
        "Pillow",
        "opencv-python",
        "matplotlib",
    ],
    extras_require={
        "torch-zoo": ["torch"],
    },
)
