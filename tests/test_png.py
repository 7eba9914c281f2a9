"""Stdlib PNG codec tests: hand-built spec vectors (chunks + filtered
scanlines computed by hand from the W3C PNG spec), full roundtrips, the
decode_image integration (runs WITHOUT pillow in this container), and loud
refusals for the unsupported corners (Adam7, 16-bit)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from n5_dask_spark.sources.png import png_decode, png_encode

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body)) + tag + body + struct.pack(
        ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
    )


def _png(w, h, color_type, raw, depth=8, interlace=0, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


# --- hand-built spec vectors (filtered bytes computed by hand) ------------


def test_sub_and_up_filters_hand_vector():
    # 2x2 gray [[10,20],[30,40]]; row0 Sub: [10, 20-10]; row1 Up: [30-10, 40-20]
    raw = b"\x01\x0a\x0a" + b"\x02\x14\x14"
    img = png_decode(_png(2, 2, 0, raw))
    assert img.shape == (2, 2, 1)
    np.testing.assert_array_equal(img[:, :, 0], [[10, 20], [30, 40]])


def test_average_and_paeth_filters_hand_vector():
    # 2x2 gray [[100,200],[150,250]]
    # row0 Average: 100-(0+0)//2=100, 200-(100+0)//2=150
    # row1 Paeth: pred(0,100,0)=100 -> 150-100=50; pred(150,200,100)=200 -> 250-200=50
    raw = b"\x03\x64\x96" + b"\x04\x32\x32"
    img = png_decode(_png(2, 2, 0, raw))
    np.testing.assert_array_equal(img[:, :, 0], [[100, 200], [150, 250]])


def test_palette_hand_vector():
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    raw = b"\x00\x00\x01"  # filter 0, indices [0, 1]
    img = png_decode(_png(2, 1, 3, raw, extra=plte))
    np.testing.assert_array_equal(img, [[[255, 0, 0], [0, 255, 0]]])


def test_rgb_sub_filter_uses_pixel_stride():
    # Sub's left neighbor is bpp bytes back (3 for RGB), not 1:
    # pixels (1,2,3),(5,7,9) -> row: filter1, [1,2,3, 4,5,6]
    raw = b"\x01" + bytes([1, 2, 3, 4, 5, 6])
    img = png_decode(_png(2, 1, 2, raw))
    np.testing.assert_array_equal(img, [[[1, 2, 3], [5, 7, 9]]])


def test_ancillary_chunks_skipped():
    text = _chunk(b"tEXt", b"Comment\x00hi")
    raw = b"\x00\x07"
    img = png_decode(_png(1, 1, 0, raw, extra=text))
    assert img[0, 0, 0] == 7


# --- roundtrips across shapes/channels ------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (16, 16), (7, 13), (5, 9, 3), (4, 4, 4), (6, 3, 2)])
def test_roundtrip(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    a = rng.integers(0, 256, shape).astype(np.uint8)
    dec = png_decode(png_encode(a))
    ref = a[:, :, None] if a.ndim == 2 else a
    np.testing.assert_array_equal(dec, ref)


def test_encoder_cycles_all_filters():
    # 5+ rows -> every filter type appears in the emitted scanlines
    a = (np.arange(6 * 8, dtype=np.uint8).reshape(6, 8) * 7) % 256
    payload = png_encode(a)
    # find IDAT, decompress, read each row's filter byte
    pos = 8
    raw = b""
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        if payload[pos + 4 : pos + 8] == b"IDAT":
            raw = zlib.decompress(payload[pos + 8 : pos + 8 + ln])
        pos += 12 + ln
    filters = [raw[i * 9] for i in range(6)]
    assert filters == [0, 1, 2, 3, 4, 0]
    np.testing.assert_array_equal(png_decode(payload)[:, :, 0], a)


# --- refusals and corruption ----------------------------------------------


def test_interlaced_refused():
    with pytest.raises(NotImplementedError, match="interlaced"):
        png_decode(_png(1, 1, 0, b"\x00\x07", interlace=1))


def test_16bit_refused():
    with pytest.raises(NotImplementedError, match="bit depth"):
        png_decode(_png(1, 1, 0, b"\x00\x00\x07", depth=16))


def test_crc_and_truncation_rejected():
    good = png_encode(np.zeros((2, 2), np.uint8))
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF" + good)
    with pytest.raises(ValueError):
        png_decode(good[:20])


def test_pixel_size_mismatch_rejected():
    with pytest.raises(ValueError, match="pixel data"):
        png_decode(_png(2, 2, 0, b"\x00\x01\x02"))  # one row short


# --- decode_image integration (no pillow needed) ---------------------------


def test_decode_image_runs_in_this_container():
    """The multimodal image path is REAL here: decode_image must decode a
    PNG payload without pillow (stdlib codec), returning RGB."""
    from n5_dask_spark.operators.multimodal import decode_image

    rgb = np.random.default_rng(3).integers(0, 256, (9, 11, 3)).astype(np.uint8)
    out = decode_image(png_encode(rgb))
    np.testing.assert_array_equal(out, rgb)
    # grayscale payloads widen to RGB like PIL's convert("RGB")
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = decode_image(png_encode(gray))
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out[:, :, 0], gray)
    np.testing.assert_array_equal(out[:, :, 1], gray)
    # non-PNG without pillow: loud refusal (unless pillow is installed)
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="pillow"):
            decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


# --- decoder totality (executor safety) ------------------------------------


def test_png_decode_totality_on_malformed_inputs():
    """decode paths that previously leaked struct.error / zlib.error /
    IndexError must raise ValueError (or the documented
    NotImplementedError) — the same executor-safety contract the blosc
    decoders pin with fuzz tests."""
    good = png_encode(np.arange(36, dtype=np.uint8).reshape(6, 6))
    # truncated 2 bytes into the final chunk's CRC (struct.error before
    # the fix; a cut that removes a whole trailing chunk is tolerated)
    with pytest.raises(ValueError, match="truncated"):
        png_decode(good[: len(good) - 2])
    # bit-flipped IDAT payload with its CRC recomputed (zlib.error before)
    sig, rest = good[:8], bytearray(good[8:])
    pos = 0
    while pos < len(rest):
        (length,) = struct.unpack_from(">I", rest, pos)
        tag = bytes(rest[pos + 4 : pos + 8])
        if tag == b"IDAT":
            rest[pos + 8 + 2] ^= 0xFF
            body = bytes(rest[pos + 8 : pos + 8 + length])
            struct.pack_into(">I", rest, pos + 8 + length, zlib.crc32(tag + body) & 0xFFFFFFFF)
        pos += 12 + length
    with pytest.raises(ValueError, match="IDAT|pixel data"):
        png_decode(sig + bytes(rest))
    # short IHDR body (struct.error before)
    bad_ihdr = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 4) + b"IHDR" + b"\x00" * 4
    bad_ihdr += struct.pack(">I", zlib.crc32(b"IHDR" + b"\x00" * 4) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="IHDR"):
        png_decode(bad_ihdr)


def test_png_palette_index_out_of_range_rejected():
    # palette image with a 1-entry PLTE but a pixel indexing entry 5
    raw = b"\x00\x05"  # one row: filter 0, index 5
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + struct.pack(">I", 3) + b"PLTE" + b"\x10\x20\x30"
        + struct.pack(">I", zlib.crc32(b"PLTE" + b"\x10\x20\x30") & 0xFFFFFFFF)
    )
    idat = zlib.compress(raw)
    png += struct.pack(">I", len(idat)) + b"IDAT" + idat
    png += struct.pack(">I", zlib.crc32(b"IDAT" + idat) & 0xFFFFFFFF)
    png += struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="palette index"):
        png_decode(png)


def test_png_implausible_dimensions_refused_before_allocation():
    ihdr = struct.pack(">IIBBBBB", 0xFFFFFFFF, 0xFFFFFFFF, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    idat = zlib.compress(b"\x00" * 10)
    png += struct.pack(">I", len(idat)) + b"IDAT" + idat
    png += struct.pack(">I", zlib.crc32(b"IDAT" + idat) & 0xFFFFFFFF)
    # a well-formed tail (IEND is now mandatory), so the refusal under test
    # is the dimension guard, not stream truncation
    png += struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="implausible"):
        png_decode(png)


def test_png_decode_fuzz_never_crashes():
    """Mutated real PNGs: ValueError / NotImplementedError only."""
    import random

    rng = random.Random(77)
    base = bytearray(png_encode(np.arange(240, dtype=np.uint8).reshape(10, 8, 3)))
    for trial in range(300):
        bad = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            bad[rng.randrange(len(bad))] = rng.randrange(256)
        try:
            png_decode(bytes(bad))
        except (ValueError, NotImplementedError):
            pass  # legal refusals
