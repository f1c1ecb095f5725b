"""ctypes binding for native host pixel ops (csrc/hostops.cpp).

:func:`blend_overlay` is the palette-over-luma composite used by host-side
sinks (bench.py, PNG/file outputs).  Exact same integer floor semantics as
the NumPy fallback, but multithreaded and GIL-free (the reference's analog
host pixel map is native Rust, infur/src/app.rs:132-144).

Built on demand with ``make -C csrc`` like the ffpipe decoder; callers use
:func:`have_hostops` + the NumPy fallback when no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "csrc")
_SO = os.path.join(_CSRC, "build", "libhostops.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _CSRC, "-s"], capture_output=True,
                           timeout=120)
        return r.returncode == 0 and os.path.exists(_SO)
    except (OSError, subprocess.TimeoutExpired):
        return False


def _bind(lib) -> bool:
    """Declare every exported symbol's signature; False on a stale .so
    (built before a symbol existed) so the caller can rebuild."""
    try:
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.hop_blend.argtypes = [u8p, u8p, u8p, u8p, ctypes.c_int, u8p,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.hop_blend.restype = ctypes.c_int
        lib.hop_unpack6.argtypes = [u8p, u8p, ctypes.c_int64]
        lib.hop_unpack6.restype = ctypes.c_int
        lib.hop_blend3.argtypes = [u8p, u8p, u8p, u8p, ctypes.c_int, u8p,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.hop_blend3.restype = ctypes.c_int
        lib.hop_scale_i420.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int]
        lib.hop_scale_i420.restype = ctypes.c_int
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.hop_delta_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int64,
                                         ctypes.c_int, ctypes.c_int, u16p,
                                         u8p, ctypes.c_int]
        lib.hop_delta_encode.restype = ctypes.c_int
        return True
    except AttributeError:
        return False


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) and not _build():
            return None
        lib = ctypes.CDLL(_SO)
        if not _bind(lib):
            # stale prebuilt .so: make is incremental but keys on mtime,
            # which a checkout can leave older than the sources — force
            # a rebuild once, then give up gracefully (NumPy fallback)
            try:
                subprocess.run(["make", "-C", _CSRC, "-sB"],
                               capture_output=True, timeout=120)
            except (OSError, subprocess.TimeoutExpired):
                return None
            lib = ctypes.CDLL(_SO)
            if not _bind(lib):
                return None
        _lib = lib
        return _lib


def have_hostops() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def blend_overlay(mask: np.ndarray, conf: np.ndarray, base: np.ndarray,
                  palette: np.ndarray, out: np.ndarray | None = None,
                  threads: int = 0) -> np.ndarray:
    """``out[f,y,x,:] = base + floor((palette[mask % P] - base) * conf / 255)``.

    mask/base: (F, H, W) u8; conf: (F, CH, CW) u8 where H % CH == 0 (pass
    quarter-res confidence directly — no host-side repeat needed);
    palette: (P, 3) u8; out: optional (F, H, W, 3) u8 buffer to reuse.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("hostops native library unavailable")
    mask = np.ascontiguousarray(mask, np.uint8)
    conf = np.ascontiguousarray(conf, np.uint8)
    base = np.ascontiguousarray(base, np.uint8)
    palette = np.ascontiguousarray(palette, np.uint8)
    f, h, w = mask.shape
    if base.shape != mask.shape:
        raise ValueError(f"base shape {base.shape} != mask shape {mask.shape}")
    cf, ch, cw = conf.shape
    if cf != f or h % ch or w % cw:
        raise ValueError(f"conf shape {conf.shape} incompatible with {mask.shape}")
    if out is None or out.shape != (f, h, w, 3) or out.dtype != np.uint8 \
            or not out.flags.c_contiguous:
        out = np.empty((f, h, w, 3), np.uint8)
    rc = lib.hop_blend(_u8p(mask), _u8p(conf), _u8p(base), _u8p(palette),
                       palette.shape[0], _u8p(out), f, h, w, ch, cw, threads)
    if rc != 0:
        raise ValueError(f"hop_blend rejected arguments (rc={rc})")
    return out


def blend_overlay_bgr(mask: np.ndarray, conf: np.ndarray, base_bgr: np.ndarray,
                      palette: np.ndarray, out: np.ndarray | None = None,
                      threads: int = 0) -> np.ndarray:
    """Palette-over-COLOR-frame composite -> display RGBA (alpha 255).

    ``out_rgb = base_rgb + floor((palette[mask % P] - base_rgb) * conf / 255)``
    with base given as (F, H, W, 3) **BGR** (the pipeline's pixel currency);
    conf may be subsampled (e.g. quarter-res).  Native + GIL-free; use
    :func:`blend_overlay_bgr_np` when :func:`have_hostops` is False.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("hostops native library unavailable")
    mask = np.ascontiguousarray(mask, np.uint8)
    conf = np.ascontiguousarray(conf, np.uint8)
    base_bgr = np.ascontiguousarray(base_bgr, np.uint8)
    palette = np.ascontiguousarray(palette, np.uint8)
    f, h, w = mask.shape
    if base_bgr.shape != (f, h, w, 3):
        raise ValueError(f"base shape {base_bgr.shape} != {(f, h, w, 3)}")
    cf, ch, cw = conf.shape
    if cf != f or h % ch or w % cw:
        raise ValueError(f"conf shape {conf.shape} incompatible with {mask.shape}")
    if out is None or out.shape != (f, h, w, 4) or out.dtype != np.uint8 \
            or not out.flags.c_contiguous:
        out = np.empty((f, h, w, 4), np.uint8)
    rc = lib.hop_blend3(_u8p(mask), _u8p(conf), _u8p(base_bgr), _u8p(palette),
                        palette.shape[0], _u8p(out), f, h, w, ch, cw, threads)
    if rc != 0:
        raise ValueError(f"hop_blend3 rejected arguments (rc={rc})")
    return out


def blend_overlay_bgr_np(mask: np.ndarray, conf: np.ndarray,
                         base_bgr: np.ndarray, palette: np.ndarray
                         ) -> np.ndarray:
    """NumPy fallback with hop_blend3's exact integer floor semantics."""
    f, h, w = mask.shape
    if conf.shape[-2:] != (h, w):
        conf = conf.repeat(h // conf.shape[-2], axis=1) \
                   .repeat(w // conf.shape[-1], axis=2)
    rgb = palette[mask % palette.shape[0]].astype(np.int32)      # (f,h,w,3) RGB
    base = base_bgr[..., ::-1].astype(np.int32)                  # BGR -> RGB
    a = conf.astype(np.int32)[..., None]
    blended = (base + (rgb - base) * a // 255).astype(np.uint8)
    alpha = np.full((f, h, w, 1), 255, np.uint8)
    return np.concatenate([blended, alpha], axis=-1)


def scale_i420(flat: np.ndarray, h: int, w: int, oh: int, ow: int,
               out: np.ndarray | None = None) -> np.ndarray:
    """Native nearest resize of a flat I420 frame — bit-exact twin of
    ``ops.yuv.scale_i420`` (GIL-free; the host Scale stage of the bench
    pipeline).  ``out`` may be any (oh*ow*3//2,) u8 view (e.g. a batch
    row) to skip the copy."""
    lib = _load()
    if lib is None:
        raise RuntimeError("hostops native library unavailable")
    flat = np.ascontiguousarray(flat, np.uint8)
    n = oh * ow * 3 // 2
    if out is None:
        out = np.empty(n, np.uint8)
    elif out.shape != (n,) or out.dtype != np.uint8 or not out.flags.c_contiguous:
        raise ValueError("out must be a contiguous (oh*ow*3//2,) u8 array")
    rc = lib.hop_scale_i420(_u8p(flat), _u8p(out), h, w, oh, ow)
    if rc != 0:
        raise ValueError(f"hop_scale_i420 rejected arguments (rc={rc})")
    return out


def delta_encode(batch: np.ndarray, cap: int, chunk: int = 64,
                 threads: int = 0):
    """Native twin of ``ops.framedelta.encode_delta`` (parallel over the
    delta frames, GIL-free): (B, nbytes) u8 -> (base, idx, data) or
    ``None`` on cap overflow / bad geometry."""
    lib = _load()
    if lib is None:
        raise RuntimeError("hostops native library unavailable")
    batch = np.ascontiguousarray(batch, np.uint8)
    b, nbytes = batch.shape
    if b < 2 or nbytes % chunk or nbytes // chunk > 65536:
        return None
    n_chunks = nbytes // chunk
    idx = np.empty((b - 1, cap), np.uint16)
    data = np.empty((b - 1, cap, chunk), np.uint8)
    rc = lib.hop_delta_encode(
        _u8p(batch), b, n_chunks, chunk, cap,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), _u8p(data),
        threads)
    if rc == 1:
        return None
    if rc != 0:
        raise ValueError(f"hop_delta_encode rejected arguments (rc={rc})")
    return np.ascontiguousarray(batch[0]), idx, data


def unpack_mask6(packed: np.ndarray, out: np.ndarray | None = None
                 ) -> np.ndarray:
    """Unpack the 6-bit confq6 mask wire format: (..., N*3) packed bytes ->
    (..., N*4) class ids (bench.py's lossless D2H payload)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("hostops native library unavailable")
    packed = np.ascontiguousarray(packed, np.uint8)
    if packed.shape[-1] % 3:
        raise ValueError(f"last dim {packed.shape[-1]} not a multiple of 3")
    n_quads = packed.size // 3
    want = packed.shape[:-1] + (packed.shape[-1] // 3 * 4,)
    if out is None or out.shape != want or out.dtype != np.uint8 \
            or not out.flags.c_contiguous:
        out = np.empty(want, np.uint8)
    rc = lib.hop_unpack6(_u8p(packed), _u8p(out), n_quads)
    if rc != 0:
        raise ValueError(f"hop_unpack6 rejected arguments (rc={rc})")
    return out
