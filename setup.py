"""Build hook for the native C++ webdataset tar reader.

The reader (native/wds_tar.cc) is a plain ctypes shared library -- it does not
link against CPython, so instead of a setuptools Extension (which would add a
Python ABI tag and link libpython) we compile it with g++ during build_py and
ship it as package data next to data/native_reader.py. Metadata lives in
pyproject.toml; this file only carries the native build step.
"""
import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution


class BuildWithNative(build_py):
    def run(self):
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native", "wds_tar.cc")
        if os.path.exists(src):
            out = os.path.join(os.path.dirname(src), "libwds_tar.so")
            try:
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-fPIC", "-Wall", "-pthread",
                     "-shared", "-o", out, src],
                    check=True)
                dst_dir = os.path.join("pea_diffusion_tpu", "data")
                self.copy_file(out, os.path.join(dst_dir, "libwds_tar.so"))
            except Exception as e:  # noqa: BLE001 - soft-fail: pure-Python reader remains
                print(f"[setup] native tar reader build skipped: {e}")
        super().run()


class BinaryDistribution(Distribution):
    """Platform-tag the wheel: it bundles the compiled tar-reader .so."""

    def has_ext_modules(self):
        return True


setup(cmdclass={"build_py": BuildWithNative}, distclass=BinaryDistribution)
