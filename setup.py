"""Build the native host-side kernels: python setup.py build_ext --inplace."""

from setuptools import Extension, setup

setup(
    name="tspn_tpu_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "tspn_tpu.native._viou_native",
            sources=["tspn_tpu/native/viou_native.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
            language="c++",
        )
    ],
)
