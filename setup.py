"""Optional native builds.

`python setup.py build_ext --inplace` compiles the C extensions ahead of
time; without it the package builds them on demand at first import
(shortseq_tpu/native_build.py, shortseq_tpu/io/native.py) and falls back
to pure Python when no compiler is available.

Both extensions are marked optional: a host without a C++ toolchain can
still `pip install` the package and run on the pure-Python/numpy
fallbacks.  _fastq_index has no Python init - it is a plain C-ABI shared
object the package binds with ctypes (io/native.py), compiled here so
installed wheels keep the native IO path without shipping csrc/.
"""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "shortseq_tpu._native",
            sources=["csrc/shortseq_native.cpp"],
            extra_compile_args=["-O3", "-march=native", "-std=c++17"],
            language="c++",
            optional=True,
        ),
        Extension(
            "shortseq_tpu._fastq_index",
            sources=["csrc/fastq_index.cpp"],
            extra_compile_args=["-O3", "-march=native", "-std=c++17",
                                "-pthread"],
            extra_link_args=["-pthread"],
            language="c++",
            optional=True,
        ),
    ],
)
