"""Image kernels: minimal PNG codec, a quantized lossy codec, phash, PSNR.

No image libraries exist in this environment (no PIL/opencv), so the engine
carries its own deterministic codecs for the `bytes:binary` multimodal
column (BASELINE.json input_hint):

* ``png`` — real PNG (8-bit RGB, zlib, all five scanline filters on decode,
  filter-0 on encode).  Lossless: decode(encode(img)) == img exactly.
* ``qnt`` — our deterministic lossy stand-in: per-channel quantization to
  ``bits`` bits + zlib.  Quantization noise for bits=6 gives PSNR ≈ 46 dB,
  comfortably over the ≥40 dB per-row validation gate.
* ``raw`` — w*h*3 bytes, no container.

phash is a DCT-based 64-bit perceptual hash (32x32 downsample → 8x8 DCT
low-frequency block → median threshold), deterministic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "RGB only"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_encode_batch(frames: np.ndarray) -> list[bytes]:
    """(n, h, w, 3) uint8 -> n PNG byte strings, byte-identical to
    ``png_encode`` per frame.  The scanline buffer (filter byte + rows) is
    assembled for the WHOLE stack in one vectorized pass; only the
    per-output deflate stream + chunk framing remain per frame (a PNG is
    one zlib stream by format definition)."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = f.shape
    assert c == 3, "RGB only"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((n, h, 1 + w * 3), dtype=np.uint8)
    raw[:, :, 1:] = f.reshape(n, h, w * 3)
    head = _PNG_SIG + _chunk(b"IHDR", ihdr)
    return [
        head + _chunk(b"IDAT", zlib.compress(r.tobytes(), 6)) + _chunk(b"IEND", b"")
        for r in raw
    ]


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # up
            rec = (line + prev) & 0xFF
        else:
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:  # sub
                    pred = a
                elif ftype == 3:  # average
                    pred = (a + b) // 2
                elif ftype == 4:  # paeth
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
                rec[x] = (line[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8.  Supports 8-bit RGB, filters 0-4."""
    if bytes(data[:8]) != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = bytes(data[pos + 4 : pos + 8])
        payload = bytes(data[pos + 8 : pos + 8 + ln])
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * 3
    return _unfilter(raw, h, stride, 3).reshape(h, w, 3)


def qnt_encode(img: np.ndarray, bits: int = 6) -> bytes:
    """Lossy: quantize each channel to ``bits`` bits, zlib the result.

    Header: magic 'QNT1', u16 w, u16 h, u8 bits.
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    q = (img >> (8 - bits)).astype(np.uint8)
    return b"QNT1" + struct.pack(">HHB", w, h, bits) + zlib.compress(q.tobytes(), 6)


def qnt_decode(data: bytes) -> np.ndarray:
    if bytes(data[:4]) != b"QNT1":
        raise ValueError("not a QNT payload")
    w, h, bits = struct.unpack_from(">HHB", data, 4)
    q = np.frombuffer(zlib.decompress(bytes(data[9:])), dtype=np.uint8).reshape(h, w, 3)
    # dequantize to bin centers
    shift = 8 - bits
    return ((q.astype(np.uint16) << shift) | (1 << (shift - 1) if shift else 0)).astype(np.uint8)


def raw_encode(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return struct.pack(">HH", w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def raw_decode(data: bytes) -> np.ndarray:
    w, h = struct.unpack_from(">HH", data, 0)
    return np.frombuffer(bytes(data[4:]), dtype=np.uint8).reshape(h, w, 3)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "qnt":
        return qnt_decode(data)
    if fmt == "raw":
        return raw_decode(data)
    # jpeg/webp etc. would need codecs not present in this environment;
    # the Ray-side plumbing treats them identically to the formats above.
    raise NotImplementedError(f"image format {fmt!r} not available in this environment")


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "qnt":
        return qnt_encode(img)
    if fmt == "raw":
        return raw_encode(img)
    raise NotImplementedError(f"image format {fmt!r} not available in this environment")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash (deterministic)."""
    g = np.asarray(img, dtype=np.float64).mean(axis=2)  # grayscale
    h, w = g.shape
    # area-resample to 32x32 via block means on an upsampled index grid
    yi = (np.arange(32)[:, None] * h) // 32
    xi = (np.arange(32)[None, :] * w) // 32
    small = g[yi, xi]
    d = _DCT32 @ small @ _DCT32.T
    low = d[:8, :8].copy()
    low[0, 0] = 0.0  # drop DC
    med = np.median(low)
    bits = (low > med).astype(np.uint8).reshape(-1)
    return int(np.packbits(bits, bitorder="little").view(np.uint64)[0])
