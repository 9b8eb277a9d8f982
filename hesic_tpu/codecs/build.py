"""Build helper for the native entropy-coding runtime.

Compiles ``csrc/rans.cpp`` into ``librans_tpu.so`` with g++ on first import
and caches the artifact next to the source (rebuilt when the source is newer).
We deliberately avoid pybind11: the library exposes a plain C ABI consumed via
ctypes, so there is no Python ABI coupling and no build-time Python deps.
"""

from __future__ import annotations

import os
import subprocess

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_THIS_DIR, "csrc", "rans.cpp")
LIB = os.path.join(_THIS_DIR, "librans_tpu.so")

_CXX_FLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-Wall"]
# -march=native vectorizes the AR coder's matvecs (independent output
# lanes, so per-output float summation order — and therefore the coder's
# encode/decode agreement — is unchanged).  -std=c++17 keeps
# -ffp-contract off (ISO mode), so no FMA contraction sneaks in.  The .so
# is built per machine on first import, so ISA portability is moot.
_ARCH_FLAGS = ["-march=native"]


def _needs_build() -> bool:
    if not os.path.exists(LIB):
        return True
    return os.path.getmtime(SRC) > os.path.getmtime(LIB)


def build(force: bool = False) -> str:
    """Compile the shared library if needed and return its path.

    HESIC_DEBUG=1 builds a debug library (-O0 -g -DHESIC_DEBUG) with CDF
    validation in the coder entry points — the reference's DEBUG_BUILD
    equivalent (setup.py:47-50 / rans_interface.cpp assert_cdfs).
    """
    debug = os.environ.get("HESIC_DEBUG", "") == "1"
    base = (["-O0", "-g", "-DHESIC_DEBUG", "-std=c++17", "-shared",
             "-fPIC", "-Wall"] if debug else _CXX_FLAGS)
    if force or _needs_build():
        cxx = os.environ.get("CXX", "g++")
        for arch in (_ARCH_FLAGS, []):
            cmd = [cxx, *base, *arch, SRC, "-o", LIB + ".tmp"]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               text=True)
                break
            except subprocess.CalledProcessError:
                if not arch:  # even the portable flags failed
                    raise
        os.replace(LIB + ".tmp", LIB)
    return LIB
