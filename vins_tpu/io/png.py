"""Grayscale PNG decoding: native C++ fast path + pure-Python fallback.

The native decoder (native/png_loader.cc, built to native/libvinsio.so with
`make -C native`) is loaded via ctypes; when absent, a pure-Python
zlib-based decoder with identical semantics takes over (~20× slower, fine
for tests).  Both support the formats robotics datasets emit: gray-8,
gray-16 (high byte), gray+alpha, RGB(A) → BT.601 luma; no interlacing.
"""
from __future__ import annotations

import ctypes
import os
import struct
import zlib

import numpy as np

_LIB = None
_LIB_TRIED = False


def _native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libvinsio.so")
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
        lib.vins_png_size.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
        lib.vins_png_decode_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def read_png_gray(path: str) -> np.ndarray:
    """Decode a PNG to a uint8 grayscale [H,W] array."""
    lib = _native()
    if lib is not None:
        w = ctypes.c_int()
        h = ctypes.c_int()
        if lib.vins_png_size(path.encode(), ctypes.byref(w), ctypes.byref(h)) == 0:
            out = np.empty((h.value, w.value), np.uint8)
            rc = lib.vins_png_decode_gray(
                path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                w.value, h.value,
            )
            if rc == 0:
                return out
    return _read_png_gray_py(path)


def _read_png_gray_py(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    off = 8
    idat = b""
    w = h = depth = ctype = None
    while off + 8 <= len(data):
        (clen,) = struct.unpack(">I", data[off : off + 4])
        typ = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + clen]
        if typ == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            assert interlace == 0, "interlaced PNG unsupported"
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        off += 12 + clen
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    assert depth == 8 or (depth == 16 and ch == 1), (depth, ctype)
    bpp = ch * depth // 8
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, stride + 1)
    filt = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)

    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = filt[y]
        cur = rows[y].copy()
        if f == 0:
            pass
        elif f == 2:
            cur = (cur + prev) & 0xFF
        else:
            # filters with a left-dependency run per-pixel-group
            cur_u = cur
            res = np.zeros(stride, np.int32)
            for x in range(stride):
                a = res[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    v = cur_u[x] + a
                elif f == 3:
                    v = cur_u[x] + ((a + b) >> 1)
                else:  # paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = cur_u[x] + pred
                res[x] = v & 0xFF
            cur = res
        out[y] = cur.astype(np.uint8)
        prev = cur.astype(np.int32)

    px = out.reshape(h, w, bpp)
    if ch == 1 and depth == 8:
        return px[:, :, 0].copy()
    if ch == 1 and depth == 16:
        return px[:, :, 0].copy()  # high byte
    if ch == 2:
        return px[:, :, 0].copy()
    rgb = px[:, :, :3].astype(np.uint32)
    return ((299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000).astype(np.uint8)


def write_png_gray(path: str, img: np.ndarray):
    """Minimal PNG writer (filter 0, gray-8) — used by tests and tools."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape

    def chunk(typ, body):
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + typ + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))
