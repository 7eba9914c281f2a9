"""Pure-Python Blosc1 chunk codec (subset) for N5 blosc compression.

The reference lists blosc among its supported N5 codecs
(``/root/reference/src/tif_to_n5.py:82``) via numcodecs' C library, which
is absent from this container. This module implements the Blosc1 chunk
container in pure Python from the PUBLIC format description (c-blosc's
``README_CHUNK_FORMAT.rst``; the same layout numcodecs/zarr documents):

    header (16 bytes, little-endian):
      0: version          1: versionlz
      2: flags            3: typesize
      4-7:  nbytes   (uncompressed size)
      8-11: blocksize
      12-15: cbytes  (total compressed size, header included)
    flags: bit 0 = byte-shuffle, bit 1 = memcpyed (raw passthrough),
           bit 2 = bit-shuffle, bits 5-7 = internal codec id
           (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd)
    memcpyed chunk: header + nbytes raw bytes.
    compressed chunk: header + int32 offset table (one absolute offset per
      block) + per block [int32 csize][codec payload]; csize equal to the
      block's uncompressed size marks a stored (uncompressed) block.
    byte-shuffle is applied PER BLOCK over the leading
    (len // typesize) * typesize bytes (all first bytes of each element,
    then all second bytes, ...); trailing remainder bytes stay in place.

Supported here — the n5-blosc/zarr DEFAULTS: internal codecs lz4 (reusing
the spec-vector-tested raw-block codec in ``lz4.py``) and zlib (stdlib),
byte-shuffle or no shuffle, multi-block chunks, stored-block and
whole-chunk-memcpy fallbacks. Unsupported variants (blosclz, snappy,
zstd, bit-shuffle) raise loudly rather than guess.

Validation caveat (documented, deliberate): no blosc implementation
exists in this container to cross-check against, so conformance rests on
the published format layout, exhaustive self-roundtrips, hand-computed
shuffle/header vectors, and the independently spec-validated lz4 block
codec. The compress side emits conservative, always-legal streams.
"""

from __future__ import annotations

import struct
import zlib as _zlib

import numpy as np

from n5_dask_spark.sources.n5.lz4 import lz4_block_compress, lz4_block_decompress

# flags
_SHUFFLE = 0x1
_MEMCPYED = 0x2
_BITSHUFFLE = 0x4

# internal codec ids (flag bits 5-7)
_CODEC_BLOSCLZ = 0
_CODEC_LZ4 = 1
_CODEC_SNAPPY = 2
_CODEC_ZLIB = 3
_CODEC_ZSTD = 4

_CODEC_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}

_HEADER = struct.Struct("<BBBBiii")
HEADER_SIZE = 16
MAX_OVERHEAD = HEADER_SIZE  # worst case: memcpyed chunk

DEFAULT_BLOCKSIZE = 1 << 20


def _shuffle(data: bytes, typesize: int) -> bytes:
    """Byte-shuffle: transpose (n_elems, typesize) -> (typesize, n_elems)."""
    if typesize <= 1 or len(data) < typesize:
        return data
    n = len(data) // typesize
    head = np.frombuffer(data[: n * typesize], np.uint8)
    return head.reshape(n, typesize).T.tobytes() + data[n * typesize :]


def _unshuffle(data: bytes, typesize: int) -> bytes:
    if typesize <= 1 or len(data) < typesize:
        return data
    n = len(data) // typesize
    head = np.frombuffer(data[: n * typesize], np.uint8)
    return head.reshape(typesize, n).T.tobytes() + data[n * typesize :]


def decompress(chunk: bytes) -> bytes:
    if len(chunk) < HEADER_SIZE:
        raise ValueError(f"blosc chunk shorter than its 16-byte header ({len(chunk)})")
    version, _versionlz, flags, typesize, nbytes, blocksize, cbytes = _HEADER.unpack_from(chunk)
    if version < 1 or version > 2:
        raise ValueError(f"unsupported blosc format version {version}")
    if nbytes < 0 or cbytes < HEADER_SIZE or cbytes > len(chunk):
        raise ValueError(f"corrupt blosc header: nbytes={nbytes} cbytes={cbytes}")
    if nbytes == 0:
        return b""
    if flags & _MEMCPYED:
        # raw passthrough: filters were never applied on this path
        if cbytes != nbytes + HEADER_SIZE:
            raise ValueError("memcpyed blosc chunk with inconsistent cbytes")
        return bytes(chunk[HEADER_SIZE : HEADER_SIZE + nbytes])
    if flags & _BITSHUFFLE:
        raise NotImplementedError(
            "blosc bit-shuffle is not supported by the pure-Python codec; "
            "re-encode with shuffle=1 (byte) or shuffle=0"
        )
    codec = (flags >> 5) & 0x7
    if codec not in (_CODEC_LZ4, _CODEC_ZLIB):
        raise NotImplementedError(
            f"blosc internal codec {_CODEC_NAMES.get(codec, codec)!r} is not "
            "supported by the pure-Python codec (lz4 and zlib are)"
        )
    if blocksize <= 0:
        raise ValueError(f"corrupt blosc header: blocksize={blocksize}")
    nblocks = -(-nbytes // blocksize)
    if HEADER_SIZE + 4 * nblocks > len(chunk):
        raise ValueError("blosc chunk truncated inside its offset table")
    offsets = struct.unpack_from(f"<{nblocks}i", chunk, HEADER_SIZE)
    out = bytearray()
    for i, off in enumerate(offsets):
        neblock = min(blocksize, nbytes - i * blocksize)
        # bounds-check BEFORE dereferencing: negative/aliasing offsets could
        # otherwise slice header bytes and decode to silently wrong data
        if off < HEADER_SIZE + 4 * nblocks or off + 4 > len(chunk):
            raise ValueError(f"blosc block offset {off} outside chunk bounds")
        (csize,) = struct.unpack_from("<i", chunk, off)
        if csize < 0 or off + 4 + csize > len(chunk):
            raise ValueError(f"blosc block at {off} claims {csize} bytes past chunk end")
        payload = chunk[off + 4 : off + 4 + csize]
        if csize == neblock:  # stored block (did not compress)
            block = bytes(payload)
        elif codec == _CODEC_LZ4:
            block = lz4_block_decompress(bytes(payload), neblock)
        else:
            block = _zlib.decompress(bytes(payload))
            if len(block) != neblock:
                raise ValueError("blosc zlib block decompressed to the wrong size")
        if flags & _SHUFFLE:
            block = _unshuffle(block, typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(f"blosc chunk decoded to {len(out)} bytes, header says {nbytes}")
    return bytes(out)


def compress(
    payload: bytes,
    typesize: int = 1,
    cname: str = "lz4",
    clevel: int = 5,
    shuffle: int = 1,
    blocksize: int = 0,
) -> bytes:
    """Encode a conformant Blosc1 chunk.

    ``shuffle``: 0 none, 1 byte-shuffle (2 = bit-shuffle is rejected).
    ``blocksize`` 0 picks a default; it is rounded down to a multiple of
    ``typesize`` as the format requires for shuffled chunks.
    """
    if cname == "lz4hc":
        cname = "lz4"  # same stream format, same flag id
    if cname not in ("lz4", "zlib"):
        raise NotImplementedError(
            f"blosc cname {cname!r} is not supported by the pure-Python codec "
            "(lz4 and zlib are); or use the lz4/gzip/xz N5 codecs directly"
        )
    if shuffle not in (0, 1):
        raise NotImplementedError("only shuffle=0 (none) and shuffle=1 (byte) are supported")
    if typesize < 1 or typesize > 255:
        raise ValueError(f"typesize must be in [1, 255], got {typesize}")
    nbytes = len(payload)
    if nbytes == 0:
        return _HEADER.pack(2, 1, 0, typesize, 0, 0, HEADER_SIZE)
    if clevel == 0:
        # blosc semantics: clevel 0 opts out of compression entirely ->
        # memcpyed chunk (not "compress at the lowest level")
        return (
            _HEADER.pack(2, 1, _MEMCPYED, typesize, nbytes, nbytes, nbytes + HEADER_SIZE)
            + payload
        )

    if blocksize <= 0:
        blocksize = min(nbytes, DEFAULT_BLOCKSIZE)
    blocksize = max(blocksize - blocksize % typesize, typesize)
    blocksize = min(blocksize, nbytes) if nbytes >= typesize else nbytes
    do_shuffle = shuffle == 1 and typesize > 1 and blocksize >= typesize

    codec_id = _CODEC_LZ4 if cname == "lz4" else _CODEC_ZLIB
    nblocks = -(-nbytes // blocksize)
    body = bytearray()
    blocks: list[bytes] = []
    for i in range(nblocks):
        block = payload[i * blocksize : (i + 1) * blocksize]
        if do_shuffle:
            block = _shuffle(block, typesize)
        if cname == "lz4":
            comp = lz4_block_compress(block)
        else:
            comp = _zlib.compress(block, min(max(clevel, 1), 9))
        if len(comp) >= len(block):
            comp = block  # stored block: csize == neblock marks it
        blocks.append(comp)
    table_end = HEADER_SIZE + 4 * nblocks
    offsets = []
    pos = table_end
    for comp in blocks:
        offsets.append(pos)
        pos += 4 + len(comp)
    if pos >= nbytes + HEADER_SIZE:
        # whole chunk did not compress: legal raw fallback, filters cleared
        return (
            _HEADER.pack(2, 1, _MEMCPYED, typesize, nbytes, blocksize, nbytes + HEADER_SIZE)
            + payload
        )
    flags = (codec_id << 5) | (_SHUFFLE if do_shuffle else 0)
    header = _HEADER.pack(2, 1, flags, typesize, nbytes, blocksize, pos)
    body += struct.pack(f"<{nblocks}i", *offsets)
    for comp in blocks:
        body += struct.pack("<i", len(comp)) + comp
    return header + bytes(body)
