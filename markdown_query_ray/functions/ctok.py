"""Loader for the C fast-path tokenizer (`_ctok.c`).

Compiles the extension once per machine with the system C compiler and caches
the resulting ``.so`` under ``/tmp/mdq_ray_cache`` keyed by source hash +
Python ABI, so every Ray worker process (and every later session) reuses the
same binary. Everything degrades gracefully: no compiler, a failed build, or
``MDQ_RAY_NO_CTOK=1`` simply means :func:`load` returns ``None`` and callers
stay on the pure-Python/regex path — identical results, just slower.

The C path only ever sees pure-ASCII text (callers check ``str.isascii()``);
non-ASCII documents always take the Python path, which handles the full
Unicode semantics.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import shutil
import subprocess
import sys
import sysconfig
from pathlib import Path

_SENTINEL = object()
_mod = _SENTINEL


def _build(src: Path, out: Path) -> bool:
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None:
        return False
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(f".tmp{os.getpid()}.so")
    cmd = [cc, "-O2", "-fPIC", "-shared",
           f"-I{sysconfig.get_paths()['include']}",
           str(src), "-o", str(tmp)]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0:
            return False
        os.replace(tmp, out)  # atomic: concurrent builders race benignly
        return True
    except Exception:
        return False
    finally:
        tmp.unlink(missing_ok=True)


def load():
    """Return the compiled `_mdq_ctok` module, or None if unavailable."""
    global _mod
    if _mod is not _SENTINEL:
        return _mod
    _mod = None
    if os.environ.get("MDQ_RAY_NO_CTOK"):
        return None
    try:
        src = Path(__file__).with_name("_ctok.c")
        tag = hashlib.sha1(
            src.read_bytes()
            + f"{sys.version_info[:2]}{sys.implementation.name}".encode()
        ).hexdigest()[:16]
        cache_dir = Path(os.environ.get("MDQ_RAY_CACHE_DIR",
                                        "/tmp/mdq_ray_cache"))
        so = cache_dir / f"_mdq_ctok_{tag}.so"
        if not so.exists() and not _build(src, so):
            return None
        spec = importlib.util.spec_from_file_location("_mdq_ctok", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        # one-call smoke check before trusting the binary
        if mod.count_ascii_terms("it's 1,000 C.I.A c++", 64) != {
                "it's": 1, "1,000": 1, "cia": 1, "c++": 1}:
            return None
        _mod = mod
    except Exception:
        _mod = None
    return _mod
