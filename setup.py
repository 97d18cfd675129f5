from setuptools import find_packages, setup

setup(
    name="morefusion_tpu",
    version="0.1.0",
    description=(
        "TPU-native multi-object 6D pose estimation & volumetric fusion"
    ),
    packages=find_packages(include=["morefusion_tpu*"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "orbax-checkpoint", "numpy"],
)
