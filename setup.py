"""Optional native builds.

`python setup.py build_ext --inplace` compiles the C extensions ahead of
time; without it the package builds them on demand at first import
(shortseq_tpu/native_build.py, shortseq_tpu/io/native.py) and falls back
to pure Python when no compiler is available.
"""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "shortseq_tpu._native",
            sources=["csrc/shortseq_native.cpp"],
            extra_compile_args=["-O3", "-march=native", "-std=c++17"],
            language="c++",
        ),
    ],
)
