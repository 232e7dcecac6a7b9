"""Native (C++) host-data loader: threaded PNG/JPEG decode + resize.

The TPU compute path is JAX/XLA/Pallas; the host input stage around it
is native C++ (loader.cpp), the tpu-native counterpart of the
reference's PIL-in-8-worker-processes input pipeline
(datasets.py:501-533).  Python binds it with ctypes — no pybind11 in
this environment — and transparently falls back to the PIL path in
data/mvtec.py when the library cannot be built (no g++, no libpng).

Build model: compiled on first use with g++ into
``~/.cache/ssad_tpu/libssadloader-<source-hash>.so`` (hash keyed on the
source, so edits rebuild; concurrent builds race benignly via an
atomic rename).  Set ``SSAD_NATIVE=0`` to disable the native path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = Path(__file__).with_name("loader.cpp")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _cache_dir() -> Path:
    d = os.environ.get("SSAD_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "ssad_tpu"
    )
    return Path(d)


def build_library(
    src_path: Path, name: str, libs: Sequence[str] = (), verbose: bool = False
) -> Optional[Path]:
    """Compile one .cpp into a cached shared library; returns the .so
    path or None.  Shared by every native component (loader,
    serving/native_frontend): hash-keyed on the source so edits
    rebuild, atomic rename so concurrent builders converge."""
    if not src_path.exists():
        return None
    src = src_path.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"lib{name}-{tag}.so"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(f".tmp{os.getpid()}")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(src_path), *libs, "-pthread", "-o", str(tmp),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        if verbose:
            print(proc.stderr)
        return None
    tmp.replace(out)  # atomic: concurrent builders converge on one file
    return out


def build(verbose: bool = False) -> Optional[Path]:
    """Compile loader.cpp if needed; return the .so path or None."""
    return build_library(_SRC, "ssadloader", ("-lpng", "-ljpeg"), verbose)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("SSAD_NATIVE", "1") == "0":
        return None
    so = build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.ssad_decode_resize_batch.restype = ctypes.c_int
    lib.ssad_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ssad_probe.restype = ctypes.c_int
    if lib.ssad_probe() != 1:
        return None
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native loader is built and loadable."""
    return _load() is not None


def _png_needs_pil(path) -> bool:
    """True for PNGs the native path must NOT decode: palette (color
    type 3) and alpha (4/6) images go through libpng's simplified-API
    compositing, and 16-bit depths through its rescaling — both with
    different semantics than PIL's convert('RGB'), which the rest of
    the pipeline (and the parity tests) are defined against.  Sniffed
    from the IHDR header (26 bytes): 8-bit grayscale (0) and truecolor
    (2) are the formats whose libpng→RGB conversion matches PIL."""
    try:
        with open(path, "rb") as f:
            head = f.read(26)
    except OSError:
        return True
    if len(head) < 26 or head[12:16] != b"IHDR":
        return True
    bit_depth, color_type = head[24], head[25]
    return bit_depth != 8 or color_type not in (0, 2)


def _supported(paths: Sequence[str]) -> bool:
    for p in paths:
        s = str(p).lower()
        if s.endswith(".png"):
            if _png_needs_pil(p):
                return False
        elif not s.endswith((".jpg", ".jpeg")):
            return False
    return True


def decode_resize_batch(
    paths: Sequence[str],
    imsize: Tuple[int, int],
    channels: int = 3,
    n_threads: int = 0,
) -> Optional[np.ndarray]:
    """Decode + bicubic-resize files to (N, H, W, C) float32 in [0, 1].

    Returns None when the native path is unavailable or a file fails to
    decode (callers fall back to PIL).  n_threads=0 → hardware count.
    PIL-parity caveat (tested in tests/test_native.py): the native path
    decodes to the target mode *before* resizing, which is identical
    for RGB/grayscale sources; palette/alpha/16-bit PNGs are detected
    from the IHDR header and fall back to PIL (_png_needs_pil).
    """
    lib = _load()
    if lib is None or not _supported(paths):
        return None
    n = len(paths)
    h, w = imsize
    out = np.zeros((n, h, w, channels), np.float32)
    if n == 0:
        return out
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    err = ctypes.c_int(-1)
    failures = lib.ssad_decode_resize_batch(
        arr, n, h, w, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads, ctypes.byref(err),
    )
    if failures:
        return None
    return out
