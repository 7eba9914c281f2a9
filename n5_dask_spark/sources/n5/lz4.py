"""Pure-Python LZ4 codec for N5 blocks (no external libs in this container).

n5-java's ``Lz4Compression`` writes blocks through lz4-java's
``LZ4BlockOutputStream`` — NOT the standard LZ4 frame format. Its framing
(one or more chunks, each at most ``blockSize`` bytes of uncompressed
payload):

    8 bytes   magic "LZ4Block"
    1 byte    token = method | level
                method: 0x10 = RAW (stored), 0x20 = LZ4 block compression
                level:  log2(blockSize) - 10  (default blockSize 65536 -> 6)
    4 bytes   LE compressed length
    4 bytes   LE decompressed length
    4 bytes   LE checksum = xxhash32(decompressed, seed 0x9747b28c) & 0xFFFFFFF
              (lz4-java masks to 28 bits; 0 for the end marker)
    n bytes   chunk data

A terminating chunk with decompressed length 0 marks end-of-stream
(lz4-java writes it; we accept streams with or without it).

The LZ4 *block* compression inside a chunk is the standard LZ4 block
format: sequences of [token][literals][2-byte LE match offset][match],
high token nibble = literal count, low nibble = match length - 4, both
with 255-extension bytes. The compressor here is a greedy single-entry
hash-table matcher (numpy-accelerated match extension, zero-run friendly);
the decompressor handles any spec-conformant stream, so containers written
by n5-java/lz4 CLI read correctly.

Two incompatible lz4 framings exist in the N5 ecosystem:

- **n5-java** (``Lz4Compression``) writes the LZ4Block stream above; this
  module WRITES that framing.
- **zarr/numcodecs** (what the reference CLI uses:
  /root/reference/src/tif_to_n5.py:82, create_n5.py:55) writes a bare
  4-byte LE *uncompressed size* prefix followed by a single raw LZ4
  block (``numcodecs.LZ4``). n5-java cannot read those chunks and vice
  versa — a long-standing ecosystem split, not something we can paper
  over on the write side.

``frame_decompress`` READS both: it sniffs the 8-byte ``LZ4Block`` magic
and falls back to numcodecs framing when absent, so containers written by
either stack decode. Writes target n5-java (the stricter, checksummed
format); use ``numcodecs_compress`` explicitly for zarr-stack parity.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"LZ4Block"
METHOD_RAW = 0x10
METHOD_LZ4 = 0x20
DEFAULT_SEED = 0x9747B28C
DEFAULT_BLOCK_SIZE = 1 << 16  # lz4-java default 64 KiB

_MASK = 0xFFFFFFFF
_P1, _P2, _P3, _P4, _P5 = 2654435761, 2246822519, 3266489917, 668265263, 374761393


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def xxhash32(data: bytes, seed: int = 0) -> int:
    """Spec implementation of XXH32. The 16-byte stripe loop is plain-int
    with unrolled lanes — each lane's accumulator is sequentially dependent
    across stripes, so numpy can't batch it, and small per-stripe numpy
    temporaries cost more than the arithmetic itself."""
    n = len(data)
    if n >= 16:
        nstripes = n // 16
        words = struct.unpack_from(f"<{nstripes * 4}I", data)
        a0 = (seed + _P1 + _P2) & _MASK
        a1 = (seed + _P2) & _MASK
        a2 = seed & _MASK
        a3 = (seed - _P1) & _MASK
        for i in range(0, nstripes * 4, 4):
            a0 = (a0 + words[i] * _P2) & _MASK
            a0 = (((a0 << 13) | (a0 >> 19)) & _MASK) * _P1 & _MASK
            a1 = (a1 + words[i + 1] * _P2) & _MASK
            a1 = (((a1 << 13) | (a1 >> 19)) & _MASK) * _P1 & _MASK
            a2 = (a2 + words[i + 2] * _P2) & _MASK
            a2 = (((a2 << 13) | (a2 >> 19)) & _MASK) * _P1 & _MASK
            a3 = (a3 + words[i + 3] * _P2) & _MASK
            a3 = (((a3 << 13) | (a3 >> 19)) & _MASK) * _P1 & _MASK
        h = (_rotl(a0, 1) + _rotl(a1, 7) + _rotl(a2, 12) + _rotl(a3, 18)) & _MASK
        pos = nstripes * 16
    else:
        h = (seed + _P5) & _MASK
        pos = 0
    h = (h + n) & _MASK
    while pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h = (h + k * _P3) & _MASK
        h = (_rotl(h, 17) * _P4) & _MASK
        pos += 4
    while pos < n:
        h = (h + data[pos] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _MASK
    h ^= h >> 13
    h = (h * _P3) & _MASK
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# LZ4 block format
# ---------------------------------------------------------------------------

_MIN_MATCH = 4
_MF_LIMIT = 12  # last match must start at least this many bytes before end
_LAST_LITERALS = 5


def lz4_block_decompress(src: bytes, dst_size: int) -> bytes:
    """Decompress one standard LZ4 block. ``dst_size`` is the exact
    decompressed size (known from the chunk header)."""
    dst = bytearray(dst_size)
    s, d, n = 0, 0, len(src)
    while s < n:
        token = src[s]
        s += 1
        # literals
        lit = token >> 4
        if lit == 15:
            while True:
                if s >= n:
                    raise ValueError("corrupt LZ4 block: truncated literal length")
                b = src[s]
                s += 1
                lit += b
                if b != 255:
                    break
        if lit:
            # explicit bounds checks: a truncated/corrupt source must raise,
            # not silently shrink dst via a short slice assignment (which
            # would shift every subsequent match copy)
            if s + lit > n:
                raise ValueError("corrupt LZ4 block: literal run past input end")
            if d + lit > dst_size:
                raise ValueError("corrupt LZ4 block: literal run past output end")
            dst[d : d + lit] = src[s : s + lit]
            s += lit
            d += lit
        if s >= n:
            break  # last sequence has no match
        # match
        if s + 2 > n:
            raise ValueError("corrupt LZ4 block: truncated match offset")
        (offset,) = struct.unpack_from("<H", src, s)
        s += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block: zero match offset")
        mlen = (token & 0x0F) + _MIN_MATCH
        if (token & 0x0F) == 15:
            while True:
                if s >= n:
                    raise ValueError("corrupt LZ4 block: truncated match length")
                b = src[s]
                s += 1
                mlen += b
                if b != 255:
                    break
        start = d - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block: match before output start")
        if d + mlen > dst_size:
            raise ValueError("corrupt LZ4 block: match run past output end")
        if offset >= mlen:
            dst[d : d + mlen] = dst[start : start + mlen]
        else:
            # overlapping match: repeat the window
            for i in range(mlen):
                dst[d + i] = dst[start + i]
        d += mlen
    if d != dst_size:
        raise ValueError(f"LZ4 block decompressed to {d} bytes, expected {dst_size}")
    return bytes(dst)


def _match_len(a: np.ndarray, i: int, j: int, limit: int) -> int:
    """Length of the common prefix of a[i:limit] and a[j:limit-ish],
    numpy-compared in one shot (long matches — zero runs — stay cheap)."""
    span = min(limit - i, limit - j)
    if span <= 0:
        return 0
    eq = a[i : i + span] == a[j : j + span]
    nz = np.flatnonzero(~eq)
    return int(nz[0]) if nz.size else span


def lz4_block_compress(src: bytes) -> bytes:
    """Greedy LZ4 block compressor (single-entry hash table, spec-conformant
    output: last 5 bytes literal, no match into the last 5)."""
    n = len(src)
    out = bytearray()
    if n == 0:
        # real liblz4 emits a lone zero token (0 literals, no match) for
        # empty input; strict decoders reject a zero-byte stream
        return b"\x00"
    a = np.frombuffer(src, dtype=np.uint8)
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    limit = n - _LAST_LITERALS
    mf_limit = n - _MF_LIMIT

    def emit(lit_start: int, lit_end: int, offset: int | None, mlen: int) -> None:
        lit = lit_end - lit_start
        token_lit = 15 if lit >= 15 else lit
        token_ml = 0
        if offset is not None:
            ml = mlen - _MIN_MATCH
            token_ml = 15 if ml >= 15 else ml
        out.append((token_lit << 4) | token_ml)
        if lit >= 15:
            rem = lit - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(src[lit_start:lit_end])
        if offset is not None:
            out.extend(struct.pack("<H", offset))
            ml = mlen - _MIN_MATCH
            if ml >= 15:
                rem = ml - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    while i < mf_limit:
        key = src[i : i + 4]
        # deterministic multiplicative hash (the standard LZ4 bucket fn):
        # builtin hash(bytes) is salted per-process, which would make the
        # compressed bytes vary across executors/runs
        h = (int.from_bytes(key, "little") * 2654435761) & _MASK
        cand = table.get(h)
        table[h] = i
        if cand is not None and i - cand <= 0xFFFF and src[cand : cand + 4] == key:
            mlen = _MIN_MATCH + _match_len(a, cand + _MIN_MATCH, i + _MIN_MATCH, limit)
            if mlen >= _MIN_MATCH:
                emit(anchor, i, i - cand, mlen)
                i += mlen
                anchor = i
                continue
        i += 1
    emit(anchor, n, None, 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# lz4-java LZ4Block stream framing (what n5-java reads/writes)
# ---------------------------------------------------------------------------


def _compression_level(block_size: int) -> int:
    level = max(0, (block_size - 1).bit_length() - 10)
    if (1 << (level + 10)) < block_size:
        level += 1
    return level


def frame_compress(payload: bytes, block_size: int = DEFAULT_BLOCK_SIZE) -> bytes:
    out = bytearray()
    level = _compression_level(block_size)
    # empty payload -> ONLY the end marker: lz4-java treats any chunk with
    # dlen==0 as the end marker and requires its checksum field to be 0
    for off in range(0, len(payload), block_size):
        chunk = payload[off : off + block_size]
        check = xxhash32(chunk, DEFAULT_SEED) & 0xFFFFFFF
        packed = lz4_block_compress(chunk)
        if len(packed) < len(chunk):
            method, data = METHOD_LZ4, packed
        else:
            method, data = METHOD_RAW, chunk
        out += MAGIC
        out.append(method | level)
        out += struct.pack("<iii", len(data), len(chunk), check)
        out += data
    # end marker (lz4-java finish()): RAW, zero lengths, zero checksum
    out += MAGIC
    out.append(METHOD_RAW | level)
    out += struct.pack("<iii", 0, 0, 0)
    return bytes(out)


def numcodecs_compress(payload: bytes) -> bytes:
    """zarr/numcodecs.LZ4 framing: 4-byte LE uncompressed size + one raw
    LZ4 block. What the reference stack (zarr.N5Store + numcodecs) writes."""
    return struct.pack("<I", len(payload)) + lz4_block_compress(payload)


# largest decompressed chunk we accept from a bare numcodecs size prefix;
# a corrupted LZ4Block magic reinterpreted as a size would typically spell
# something enormous, and no sane N5 block approaches 1 GiB
_NUMCODECS_MAX_DST = 1 << 30


def numcodecs_decompress(raw: bytes) -> bytes:
    if len(raw) < 4:
        raise ValueError("numcodecs LZ4 chunk shorter than its size prefix")
    (dst_size,) = struct.unpack_from("<I", raw, 0)
    if dst_size > _NUMCODECS_MAX_DST:
        raise ValueError(
            f"numcodecs LZ4 size prefix {dst_size} exceeds {_NUMCODECS_MAX_DST}; "
            "stream is corrupt or not lz4 at all"
        )
    return lz4_block_decompress(raw[4:], dst_size)


def frame_decompress(raw: bytes) -> bytes:
    # Sniff the framing: lz4-java streams always start with the 8-byte
    # "LZ4Block" magic; zarr/numcodecs chunks start with a bare LE size.
    if raw[:8] != MAGIC:
        try:
            return numcodecs_decompress(raw)
        except ValueError as exc:
            # name BOTH framings tried: a one-byte-corrupted LZ4Block magic
            # otherwise surfaces as a baffling numcodecs complaint
            raise ValueError(
                "chunk is neither lz4-java LZ4Block (bad magic in first 8 "
                f"bytes) nor a valid numcodecs lz4 stream ({exc})"
            ) from exc
    out = bytearray()
    pos = 0
    n = len(raw)
    seen_end = False
    while pos < n:
        if raw[pos : pos + 8] != MAGIC:
            raise ValueError("bad LZ4Block magic")
        token = raw[pos + 8]
        method = token & 0xF0
        clen, dlen, check = struct.unpack_from("<iii", raw, pos + 9)
        pos += 21
        # lz4-java validates the method nibble on EVERY chunk header,
        # including the end marker (LZ4BlockInputStream throws "Stream is
        # corrupted" for any method outside {RAW, LZ4} before it looks at
        # the lengths) — validating only in the payload branch (pre-r12)
        # let a method-nibble flip in the end marker decode clean
        if method not in (METHOD_RAW, METHOD_LZ4):
            raise ValueError(f"unknown LZ4Block method 0x{method:02x}")
        # lz4-java bounds every chunk's declared size by the block size
        # encoded in the token's level nibble (blockSize = 1 << (level +
        # COMPRESSION_LEVEL_BASE), base 10) and throws "Stream is
        # corrupted" past it — parity keeps a corrupted dlen from asking
        # for a huge allocation here too
        if dlen > 1 << ((token & 0x0F) + 10):
            raise ValueError(
                f"LZ4Block chunk declares {dlen} bytes, over the token's "
                f"block size bound {1 << ((token & 0x0F) + 10)}"
            )
        if dlen == 0:
            # lz4-java writes the end marker with clen=0 and checksum=0 and
            # its LZ4BlockInputStream raises "Stream is corrupted" on any
            # other value — accepting arbitrary bytes here (pre-r12) let a
            # flipped bit in the marker's check/clen field decode clean
            # where the reference stack refuses
            if check != 0 or clen != 0:
                raise ValueError(
                    "LZ4Block end marker carries nonzero fields "
                    f"(clen={clen}, check={check}); lz4-java requires both 0"
                )
            seen_end = True
            break  # end marker
        # negative lengths are corruption: a negative clen would slice
        # empty AND move pos backwards, spinning this loop forever
        if clen < 0 or dlen < 0:
            raise ValueError(f"LZ4Block chunk with negative length (clen={clen}, dlen={dlen})")
        if pos + clen > n:
            raise ValueError("LZ4Block chunk truncated mid-payload")
        data = raw[pos : pos + clen]
        pos += clen
        if method == METHOD_RAW:
            if clen != dlen:
                raise ValueError(
                    f"raw LZ4Block chunk stores {clen} bytes but declares {dlen}"
                )
            chunk = bytes(data)
        elif method == METHOD_LZ4:
            chunk = lz4_block_decompress(data, dlen)
        else:
            raise ValueError(f"unknown LZ4Block method 0x{method:02x}")
        # lz4-java compares the stored int against the 28-bit-masked hash
        # with plain != — a stored field with ANY high-nibble bit set can
        # never match, so it refuses; exact parity (masking both sides,
        # pre-r12, silently accepted high-nibble corruption)
        if (xxhash32(chunk, DEFAULT_SEED) & 0xFFFFFFF) != check:
            raise ValueError("LZ4Block checksum mismatch")
        out += chunk
    if not seen_end:
        # lz4-java's LZ4BlockInputStream refuses EOF without the end marker
        # ("Stream ended prematurely"); accepting it here would let a stream
        # truncated AT a chunk boundary decode clean — the r11 corruption
        # fuzz's one non-raising truncation (tests/test_corruption_fuzz.py)
        raise ValueError("LZ4Block stream ended without its end marker")
    return bytes(out)
