"""Pure-Python PNG codec (stdlib zlib + struct only).

A REAL — not stubbed — decode path for the multimodal pipeline that
works in this container (no Pillow). Implements the PNG spec (RFC 2083
/ W3C PNG): chunk walk with CRC verification, zlib inflate of the IDAT
stream, and all five scanline filters (None/Sub/Up/Average/Paeth) for
8-bit greyscale / RGB / RGBA, non-interlaced. The encoder exists so
tests can build genuinely valid PNGs from known pixel data and verify
the decoder end-to-end (encode → decode → pixel-exact round-trip).

Scope is deliberately narrow: bit depths other than 8, palette images,
and Adam7 interlace raise ``ValueError`` — at 100 TB you want a
malformed or unsupported payload to be an explicit per-row error your
pipeline can quarantine, not a silent wrong answer. (Reference parity
note: the reference stores images as opaque blobs only —
aerovaldb.py:1322-1398 — so this codec is part of the Spark engine's
pipeline surface, not reference parity.)
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# colour type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` per pixel) into
    a valid PNG. ``channels``: 1 = greyscale, 3 = RGB, 4 = RGBA."""
    colour = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {stride * height}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, colour, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> bytearray:
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT stream length does not match dimensions")
    out = bytearray(stride * height)
    prev_off = -stride
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        off = y * stride
        if ftype == 0:  # None
            out[off : off + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[off + i - channels] if i >= channels else 0
                out[off + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            if y == 0:
                out[off : off + stride] = line
            else:
                for i in range(stride):
                    out[off + i] = (line[i] + out[off + prev_off + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[off + i - channels] if i >= channels else 0
                up = out[off + prev_off + i] if y > 0 else 0
                out[off + i] = (line[i] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = out[off + i - channels] if i >= channels else 0
                up = out[off + prev_off + i] if y > 0 else 0
                ul = out[off + prev_off + i - channels] if (y > 0 and i >= channels) else 0
                out[off + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype} on row {y}")
    return out


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG → ``(width, height, channels, pixels)`` with pixels
    as raw row-major 8-bit samples. Raises ``ValueError`` on anything
    outside the supported profile (8-bit grey/RGB/RGBA, no interlace)
    or on a corrupt stream (bad CRC, bad inflate, truncated chunks)."""
    if not payload.startswith(_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIGNATURE)
    width = height = channels = -1
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):  # body + CRC must fit
            raise ValueError(f"truncated {tag!r} chunk")
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, colour, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if colour not in _CHANNELS:
                raise ValueError(
                    f"unsupported colour type {colour} (grey/RGB/RGBA only)"
                )
            if interlace != 0:
                raise ValueError("Adam7 interlace not supported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            channels = _CHANNELS[colour]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if width < 0:
        raise ValueError("missing IHDR")
    if not seen_iend:
        raise ValueError("missing IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    return width, height, channels, bytes(_unfilter(raw, width, height, channels))


def png_mean_luma(payload: bytes) -> tuple[int, int, float]:
    """Decode and reduce to ``(width, height, mean_luma in [0,1])`` —
    Rec. 601 luma for colour images, plain mean for greyscale. This is
    the per-row kernel :func:`..multimodal.decode_images` runs with
    ``decoder='builtin-png'``."""
    import numpy as np

    width, height, channels, pixels = decode_png(payload)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    a = arr.astype(np.float64)
    if channels == 1:
        luma = a[:, :, 0]
    else:  # RGB / RGBA (alpha ignored, like PIL convert("L"))
        luma = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    return width, height, float(luma.mean() / 255.0)
