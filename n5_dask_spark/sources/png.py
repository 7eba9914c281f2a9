"""Stdlib-only PNG codec (zlib + unfilter) for the multimodal image path.

The container has no image libraries, so without this module the image
branch of ``operators/multimodal.decode_image`` could only run its
deterministic fallback. PNG needs nothing beyond ``zlib`` (stdlib) and the
published file layout (RFC 2083 / the W3C PNG spec): 8-byte signature,
length-prefixed CRC-tagged chunks, IDAT = one zlib stream of per-scanline
filtered bytes.

Supported: non-interlaced, bit depth 8, color types 0 (gray), 2 (RGB),
3 (palette, via PLTE), 4 (gray+alpha) and 6 (RGBA); all five scanline
filters (None/Sub/Up/Average/Paeth) on both encode and decode. Adam7
interlacing and bit depths 1/2/4/16 raise loudly — they are rare in
training corpora and a silent misdecode is worse than a refusal.

The encoder cycles the filter type per row (row i uses filter i % 5) so a
single roundtrip exercises every unfilter path end-to-end.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# channels per color type (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Apply forward filter ``ftype`` to one scanline (uint8 arrays)."""
    r = row.astype(np.int16)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:  # Sub
        out = r - left
    elif ftype == 2:  # Up
        out = r - up
    elif ftype == 3:  # Average
        out = r - (left + up) // 2
    else:  # Paeth
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
        out = r - pred
    return (out % 256).astype(np.uint8).tobytes()


def _unfilter_row(ftype: int, cur: bytearray, prev: bytes, bpp: int) -> None:
    """Reverse one scanline's filter in place. Sub/Average/Paeth are
    sequential in the pixel direction (each byte depends on the
    just-reconstructed byte bpp to its left), so they loop; None and Up
    vectorize."""
    n = len(cur)
    if ftype == 0:
        return
    if ftype == 2:  # Up
        out = (np.frombuffer(bytes(cur), np.uint8) + np.frombuffer(prev, np.uint8)).astype(
            np.uint8
        )
        cur[:] = out.tobytes()
        return
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        return
    if ftype == 3:  # Average
        for i in range(n):
            a = cur[i - bpp] if i >= bpp else 0
            cur[i] = (cur[i] + (a + prev[i]) // 2) & 0xFF
        return
    if ftype == 4:  # Paeth
        for i in range(n):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            cur[i] = (cur[i] + pred) & 0xFF
        return
    raise ValueError(f"PNG scanline filter type {ftype} is invalid (spec allows 0-4)")


def png_encode(arr: np.ndarray) -> bytes:
    """Encode an HxW (gray) or HxWxC (C in 2,3,4) uint8 array as PNG.

    Row i is filtered with type i % 5, so decoding a multi-row image
    exercises every unfilter path.
    """
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"expected HxW or HxWxC (C<=4) uint8 array, got shape {arr.shape}")
    h, w, c = a.shape
    if h < 1 or w < 1:
        raise ValueError(f"empty image {arr.shape}")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = a.reshape(h, w * c)
    zero = np.zeros(w * c, np.uint8)
    raw = bytearray()
    for i in range(h):
        ftype = i % 5
        raw.append(ftype)
        raw += _filter_row(ftype, rows[i], rows[i - 1] if i else zero, c)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to an HxWxC uint8 array."""
    if len(payload) < len(_SIGNATURE) or payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    seen_iend = False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):  # body or its 4-byte CRC cut off
            raise ValueError(f"PNG chunk {tag!r} truncated")
        body = payload[pos + 8 : pos + 8 + length]
        crc_expect = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc_expect:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"PNG IHDR is {len(body)} bytes, spec says 13")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped
    if ihdr is None:
        raise ValueError("PNG has no IHDR chunk")
    if not seen_iend:
        # IEND is mandatory (PNG spec 5.6): a stream that just stops is a
        # truncated file, even when every IDAT byte arrived — refuse like
        # the lz4-java end-marker check (r11 corruption fuzz)
        raise ValueError("PNG stream ended without its IEND chunk")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG is not supported (re-encode progressive=False)")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} is not supported (8 only)")
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError(f"invalid PNG compression/filter method {comp}/{filt}")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG without a PLTE chunk")
    c = _CHANNELS[color_type]
    stride = w * c
    expected = h * (stride + 1)
    if expected > 1 << 31:
        # executor safety: a crafted IHDR can claim 2^32 x 2^32 pixels;
        # refuse before allocating rather than OOMing the worker
        raise ValueError(f"PNG claims implausible {w}x{h}x{c} pixel data")
    try:
        # decompressobj + max_length caps a deflate bomb at the declared
        # size instead of letting it expand unbounded before the check
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT stream is corrupt: {exc}") from exc
    if len(raw) != expected or not d.eof and d.decompress(b"", 1):
        raise ValueError(
            f"PNG pixel data is not the expected {expected} bytes for {w}x{h}x{c}"
        )
    out = np.empty((h, stride), np.uint8)
    prev = bytes(stride)
    for i in range(h):
        ftype = raw[i * (stride + 1)]
        cur = bytearray(raw[i * (stride + 1) + 1 : (i + 1) * (stride + 1)])
        _unfilter_row(ftype, cur, prev, c)
        prev = bytes(cur)
        out[i] = np.frombuffer(prev, np.uint8)
    img = out.reshape(h, w, c)
    if color_type == 3:
        if int(img[:, :, 0].max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range for its PLTE chunk")
        img = plte[img[:, :, 0]]
    return img
