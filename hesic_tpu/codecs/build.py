"""Build helper for the native entropy-coding runtime.

Compiles ``csrc/rans.cpp`` into ``librans_tpu.so`` (or
``librans_tpu_dbg.so`` under HESIC_DEBUG=1) with g++ on first import and
caches the artifact next to the source (rebuilt when the source is newer).
We deliberately avoid pybind11: the library exposes a plain C ABI consumed via
ctypes, so there is no Python ABI coupling and no build-time Python deps.
"""

from __future__ import annotations

import os
import subprocess

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_THIS_DIR, "csrc", "rans.cpp")

# -ffp-contract=off: GCC defaults to -ffp-contract=fast even in ISO
# (-std=c++17) mode, so without this -march=native would enable FMA
# contraction in the AR coder's float matvecs.  Encode/decode always share
# one .so, but a stream persisted before a rebuild (or made on another
# machine) must decode identically after one — so the float pipeline is
# pinned to exact IEEE mul+add.  -march=native still vectorizes the
# independent output lanes (summation order per output is unchanged).
_CXX_FLAGS = ["-O3", "-std=c++17", "-ffp-contract=off", "-shared", "-fPIC",
              "-Wall"]
_DBG_FLAGS = ["-O0", "-g", "-DHESIC_DEBUG", "-std=c++17",
              "-ffp-contract=off", "-shared", "-fPIC", "-Wall"]
_ARCH_FLAGS = ["-march=native"]


def _is_debug() -> bool:
    return os.environ.get("HESIC_DEBUG", "") == "1"


def _lib_path() -> str:
    # Debug and release builds get distinct filenames so toggling
    # HESIC_DEBUG always loads a library built with the matching flags
    # (a shared name let a stale -O0 .so persist into release runs).
    name = "librans_tpu_dbg.so" if _is_debug() else "librans_tpu.so"
    return os.path.join(_THIS_DIR, name)


def _needs_build(lib: str) -> bool:
    if not os.path.exists(lib):
        return True
    return os.path.getmtime(SRC) > os.path.getmtime(lib)


def build(force: bool = False) -> str:
    """Compile the shared library if needed and return its path.

    HESIC_DEBUG=1 builds a debug library (-O0 -g -DHESIC_DEBUG) with CDF
    validation in the coder entry points — the reference's DEBUG_BUILD
    equivalent (setup.py:47-50 / rans_interface.cpp assert_cdfs).
    """
    lib = _lib_path()
    base = _DBG_FLAGS if _is_debug() else _CXX_FLAGS
    if force or _needs_build(lib):
        cxx = os.environ.get("CXX", "g++")
        # pid-unique temp + atomic rename: concurrent first-import builds
        # (e.g. two pytest/tool processes) must not race on one .tmp
        tmp = f"{lib}.{os.getpid()}.tmp"
        for arch in (_ARCH_FLAGS, []):
            cmd = [cxx, *base, *arch, SRC, "-o", tmp]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               text=True)
                break
            except subprocess.CalledProcessError:
                if not arch:  # even the portable flags failed
                    raise
        os.replace(tmp, lib)
    return lib
