"""pip packaging (reference parity: torch-quiver ships via setup.py with
a native extension; here the native library builds lazily at first use
via ctypes, so the wheel is pure-python + one C++ source)."""
from setuptools import setup, find_packages

setup(
    name="quiver-tpu",
    version="0.1.0",
    description=("TPU-native graph learning acceleration: sampling, "
                 "tiered feature collection, workload-aware GNN serving"),
    packages=find_packages(include=["quiver_tpu", "quiver_tpu.*"]),
    package_data={"quiver_tpu.native": ["quiver_host.cpp"]},
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "numpy"],
    extras_require={"ckpt": ["orbax-checkpoint"]},
)
