"""Package setup for daft_exprt_tpu.

Build the native pitch tracker first (optional; the pure-Python tracker
is the default): ``make -C native/pitch_tracker``.
"""

from setuptools import find_packages, setup

setup(
    name="daft_exprt_tpu",
    version="0.1.0",
    description=("TPU-native expressive TTS: Daft-Exprt acoustic model "
                 "and pipeline in JAX/XLA"),
    packages=find_packages(include=["daft_exprt_tpu",
                                    "daft_exprt_tpu.*"]),
    package_data={"daft_exprt_tpu": ["bin/pitch_tracker"]},
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "numpy",
        "optax",
        "orbax-checkpoint",
        "scipy",
        "tensorboardX",
        "matplotlib",
    ],
)
