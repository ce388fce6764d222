"""Builds the native (C++) runtime library as part of the wheel.

The library is a plain C-ABI shared object consumed via ctypes
(snickery_tpu/native/__init__.py) — building it as a setuptools Extension
just places a compiled .so inside the package; no Python C API involved.
A build without a C++ toolchain still succeeds (the extension is optional:
every native entry point has a pure-python fallback).
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as e:  # noqa: BLE001 — toolchain-less install is fine
            print(f"WARNING: native extension skipped ({e}); "
                  "pure-python fallbacks will be used")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # noqa: BLE001
            print(f"WARNING: native extension skipped ({e}); "
                  "pure-python fallbacks will be used")


setup(
    ext_modules=[
        Extension(
            "snickery_tpu.native._libsnickery_native",
            sources=["native/epochs.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-fPIC", "-pthread"],
            language="c++",
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
