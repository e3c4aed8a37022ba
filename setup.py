"""Native-extension build for the packaged install.

Compiles the C++ data layer (matching parser + PLY writer + libpng batch
decoder, native/*.cpp) into ``sfm_nerf_tpu._libmatching_parser`` so a pip
install ships the fast path; ``sfm_nerf_tpu.io.sfm_data`` loads it via
ctypes from the package directory (it exports plain C symbols — no Python
init needed — so building it as an "extension" is just a portable way to
get a compiled artifact into the wheel).  When libpng dev headers are
missing the decoder is dropped and image loads fall back to imageio,
mirroring native/build.sh.
"""
import os
import tempfile
import subprocess

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


def _has_libpng() -> bool:
    probe = b"#include <png.h>\nint main(){return 0;}\n"
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "probe.c")
        with open(src, "wb") as f:
            f.write(probe)
        try:
            return subprocess.run(
                ["cc", src, "-lpng", "-o", os.path.join(td, "probe")],
                capture_output=True,
            ).returncode == 0
        except OSError:
            return False


class BuildExt(build_ext):
    """The .so exports C symbols for ctypes; suppress the missing
    PyInit_* that a normal extension would need."""

    def get_export_symbols(self, ext):
        return []


if _has_libpng():
    sources = ["native/matching_parser.cpp", "native/image_decode.cpp"]
    libraries = ["png"]
else:
    sources = ["native/matching_parser.cpp"]
    libraries = []

setup(
    ext_modules=[
        Extension(
            "sfm_nerf_tpu._libmatching_parser",
            sources=sources,
            libraries=libraries,
            extra_compile_args=["-O3"],
            optional=True,  # no toolchain -> pure-Python fallbacks
        )
    ],
    cmdclass={"build_ext": BuildExt},
)
