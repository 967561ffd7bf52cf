"""On-demand compilation for the csrc/ native helpers.

One home for the compile-if-missing-or-STALE logic: the .so files are
gitignored build state, so a checkout that built them before a source
change would otherwise keep loading the old behavior silently (each
binding's Python twin is the oracle — a stale native lib diverges from it
without any test noticing until the parity suite runs)."""

from __future__ import annotations

import os
import subprocess


def csrc_path(*names: str) -> str:
    """Path inside the package's csrc/ directory (shipped as package data,
    so the same resolution works for a repo checkout and a pip install)."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(pkg_root, "csrc", *names)


def ensure_native_lib(src: str, lib: str, flags=("-O3",)) -> str | None:
    """Compile `src` to shared library `lib` when the lib is missing or
    older than the source. Returns the lib path, or None when no compiler
    is available / compilation fails (callers fall back to Python)."""
    try:
        stale = (not os.path.exists(lib)
                 or os.path.getmtime(lib) < os.path.getmtime(src))
    except OSError:
        return None
    if stale:
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", *flags, "-fPIC", "-shared", "-std=c++17", src,
                 "-o", lib],
                check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    return lib if os.path.exists(lib) else None
