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
           bit 2 = bit-shuffle, bit 4 = chunk is NOT block-split,
           bits 5-7 = internal codec id
           (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd)
    memcpyed chunk: header + nbytes raw bytes.
    compressed chunk: header + int32 offset table (one absolute offset per
      block) + per block one or more [int32 csize][codec payload] streams;
      csize equal to the stream's uncompressed size marks a stored
      (uncompressed) stream.
    block splitting (c-blosc ``blosc_d``/``split_block``): unless flag bit
      4 is set, a block whose uncompressed size equals the header
      blocksize (i.e. every non-leftover block) is split into ``typesize``
      independent sub-streams of blocksize/typesize bytes each, provided
      typesize <= 16 and blocksize/typesize >= 128. The trailing leftover
      block is never split. c-blosc's FORWARD_COMPAT default emits split
      chunks for blosclz/lz4, so real-world chunks routinely use this.
    byte-shuffle is applied PER BLOCK over the leading
    (len // typesize) * typesize bytes (all first bytes of each element,
    then all second bytes, ...); trailing remainder bytes stay in place.
    A split block's streams are exactly its shuffled bytes cut into
    typesize contiguous pieces (stream j = the j-th bytes of every
    element), so decode = concatenate streams, then unshuffle.

Supported here: DECODE of internal codecs lz4 (reusing the
spec-vector-tested raw-block codec in ``lz4.py``), zlib (stdlib),
blosclz (pure-Python FastLZ-descendant decoder below), snappy
(pure-Python raw-format decoder below) and zstd (via pyarrow's bundled
libzstd when available — zstd's FSE/Huffman entropy stages are out of
pure-Python reach, but pyarrow is already a dependency of the
Arrow/pandas-UDF path, so the leg is real wherever the engine runs);
both split and unsplit block layouts, byte-shuffle, bit-shuffle or no
shuffle, multi-block chunks, stored-stream and whole-chunk-memcpy
fallbacks. ENCODE covers every Blosc1 internal codec: blosclz and snappy
(pure-Python greedy LZ over the same grammars the decoders accept —
compatibility legs for containers whose attributes pin those cnames; the
default write path stays lz4), lz4, zlib and (pyarrow-gated) zstd —
always unsplit, with flag bit 4 set so real c-blosc decoders read the
single-stream layout. The one refusal left is zstd without pyarrow
(entropy coding is out of pure-Python reach), pinned by a recorded chunk
vector in ``tests/test_blosc.py``.

Validation: the lz4 and snappy stream decoders (and the lz4 encoder) are
cross-checked against pyarrow's real liblz4/libsnappy in
``tests/test_blosc.py``/``test_lz4.py`` — non-circular evidence for the
token loops. No *blosc* implementation exists in this container, so the
chunk-container layout itself rests on the published format description,
exhaustive self-roundtrips, and hand-computed shuffle/header/blosclz
vectors. The compress side emits conservative, always-legal streams.
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
_DONT_SPLIT = 0x10  # c-blosc: chunk blocks are single-stream (not split)

# c-blosc split_block() constants: a block is split into `typesize`
# sub-streams only when typesize <= MAX_SPLITS and
# blocksize/typesize >= MIN_BUFFERSIZE (and it is not the leftover block)
_MAX_SPLITS = 16
_MIN_BUFFERSIZE = 128

# internal codec ids (flag bits 5-7)
_CODEC_BLOSCLZ = 0
_CODEC_LZ4 = 1
_CODEC_SNAPPY = 2
_CODEC_ZLIB = 3
_CODEC_ZSTD = 4

_CODEC_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}

# zstd leg: probed lazily so the pure-Python codecs pay no pyarrow import
# cost on executors that never touch a zstd chunk.
_zstd_probe: bool | None = None


def _zstd(level: int | None = None):
    """Return a pyarrow zstd ``Codec`` (real libzstd), or None if absent."""
    global _zstd_probe
    if _zstd_probe is None:
        try:
            import pyarrow as pa

            _zstd_probe = bool(pa.Codec.is_available("zstd"))
        except Exception:
            _zstd_probe = False
    if not _zstd_probe:
        return None
    import pyarrow as pa

    return pa.Codec("zstd") if level is None else pa.Codec("zstd", compression_level=level)

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


def _bitshuffle(data: bytes, typesize: int) -> bytes:
    """Bit-shuffle (bitshuffle library semantics, as c-blosc's wrapper
    applies it per block): view the leading multiple-of-8-elements slice as
    a (n_elems, typesize*8) bit matrix and transpose it to bit planes.

    Plane order and packing derived from the public scalar kernels
    (``bshuf_trans_bit_elem``): ``TRANS_BIT_8X8`` is the standard 8x8
    bit-matrix transpose with byte i as row i and bit j (LSB = 0) as
    column j, so new byte k bit j = old byte j bit k — plane order is
    **LSB-first** (output row ``j*8 + k`` is bit ``k`` of byte ``j`` of
    every element, ``bshuf_trans_bitrow_eight``'s byte-major row layout),
    and within a plane element ``i`` lands at bit ``i % 8`` of packed
    byte ``i // 8`` (element 0 in the LSB). The c-blosc wrapper
    (``shuffle.c:bitshuffle``) truncates to a multiple of 8 elements and
    memcpys the leftover bytes — mirrored here so both generations of
    chunks parse.
    """
    nelem = (len(data) // typesize) & ~7
    head = nelem * typesize
    if nelem == 0:
        return data
    a = np.frombuffer(data[:head], np.uint8).reshape(nelem, typesize)
    planes = np.unpackbits(a, axis=1, bitorder="little").T
    return np.packbits(planes, axis=1, bitorder="little").tobytes() + data[head:]


def _bitunshuffle(data: bytes, typesize: int) -> bytes:
    nelem = (len(data) // typesize) & ~7
    head = nelem * typesize
    if nelem == 0:
        return data
    planes = np.frombuffer(data[:head], np.uint8).reshape(typesize * 8, nelem // 8)
    bits = np.unpackbits(planes, axis=1, bitorder="little")
    return np.packbits(bits.T, axis=1, bitorder="little").tobytes() + data[head:]


def blosclz_decompress(data: bytes, expected: int) -> bytes:
    """Decode one blosclz stream (c-blosc's default internal codec).

    Pure-Python port of the public ``blosclz_decompress`` token loop
    (c-blosc ``blosclz.c``, a FastLZ descendant). Token = control byte:
    ``ctrl < 32`` is a literal run of ``ctrl + 1`` bytes; otherwise a
    match of ``(ctrl >> 5) + 2`` bytes (3-bit length 7 = extended by a
    255-terminated byte chain) at distance ``((ctrl & 31) << 8) + code +
    1`` where ``code`` is the next byte; ``code == 255`` with the 13-bit
    offset field saturated (``ofs == 31 << 8``) switches to far mode:
    distance = big-endian uint16 + 8192 (MAX_DISTANCE + 1). Matches may
    overlap their output (RLE-style period copy).
    """
    n = len(data)
    if n == 0:
        if expected:
            raise ValueError("empty blosclz stream with nonzero expected size")
        return b""
    out = bytearray()
    ip = 1
    ctrl = data[0] & 31
    while True:
        if ctrl >= 32:
            length = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if length == 6:  # 3-bit length field saturated: extend
                while True:
                    if ip >= n:
                        raise ValueError("blosclz stream truncated in match length")
                    code = data[ip]
                    ip += 1
                    length += code
                    if code != 255:
                        break
            if ip >= n:
                raise ValueError("blosclz stream truncated in match offset")
            code = data[ip]
            ip += 1
            length += 3
            if code == 255 and ofs == (31 << 8):
                if ip + 1 >= n:
                    raise ValueError("blosclz stream truncated in far match offset")
                ofs = (data[ip] << 8) | data[ip + 1]
                ip += 2
                src = len(out) - ofs - 8191 - 1  # MAX_DISTANCE
            else:
                src = len(out) - ofs - code - 1
            if src < 0:
                raise ValueError("blosclz match reaches before the stream start")
            if len(out) + length > expected:
                raise ValueError("blosclz stream decodes past its declared size")
            # overlap-safe period copy: each pass copies the bytes that
            # already exist, doubling the available window (RLE included)
            while length > 0:
                avail = len(out) - src
                take = min(length, avail)
                out += out[src : src + take]
                src += take
                length -= take
            if ip >= n:
                break
            ctrl = data[ip]
            ip += 1
        else:
            run = ctrl + 1
            if ip + run > n:
                raise ValueError("blosclz stream truncated in literal run")
            if len(out) + run > expected:
                raise ValueError("blosclz stream decodes past its declared size")
            out += data[ip : ip + run]
            ip += run
            if ip >= n:
                break
            ctrl = data[ip]
            ip += 1
    if len(out) != expected:
        raise ValueError(f"blosclz stream decoded to {len(out)} bytes, expected {expected}")
    return bytes(out)


def blosclz_compress(data: bytes) -> bytes:
    """Encode one blosclz stream the token loop above accepts.

    Greedy hash-table LZ emitting only the documented token grammar:
    literal runs of <= 32 bytes (ctrl = run - 1) and matches of length
    >= 3 at distance <= 8191 — the 13-bit ctrl/code offset field. The
    far-mode escape (code 255 with the offset field saturated) is
    deliberately never emitted: with distance - 1 <= 8190, a saturated
    high field (31) caps the low byte at 254, so every emitted
    (ofs, code) pair is unambiguous by construction. Length fields
    beyond 6 use the 255-terminated extension chain, written BEFORE the
    offset low byte exactly as the decoder consumes them. The first
    token is always a literal run (position 0 has no prior match), which
    is what the decoder's ``data[0] & 31`` read assumes.

    Compatibility leg: pure Python (~MB/s), for re-encoding into a
    container whose attributes pin cname=blosclz; the engine's default
    write path stays lz4.
    """
    n = len(data)
    out = bytearray()
    lit_start = 0  # start of the pending literal run

    def flush(end: int) -> None:
        i = lit_start
        while i < end:
            run = min(32, end - i)
            out.append(run - 1)
            out.extend(data[i : i + run])
            i += run

    table: dict[bytes, int] = {}
    i = 0
    while i + 3 <= n:
        key = data[i : i + 3]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 8191:
            i += 1
            continue
        # extend the match greedily
        length = 3
        while i + length < n and data[cand + length] == data[i + length]:
            length += 1
        flush(i)
        dm1 = i - cand - 1  # <= 8190: far-mode pattern unreachable
        code_l = length - 3
        if code_l < 6:
            out.append(((code_l + 1) << 5) | (dm1 >> 8))
        else:
            out.append((7 << 5) | (dm1 >> 8))
            rem = code_l - 6
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)  # may be 0; any byte != 255 ends the chain
        out.append(dm1 & 255)
        # index the covered positions so later matches can start inside
        for j in range(i + 1, min(i + length, n - 2)):
            table[data[j : j + 3]] = j
        i += length
        lit_start = i
    flush(n)
    return bytes(out)


def snappy_decompress(data: bytes, expected: int) -> bytes:
    """Decode one raw-format snappy stream (c-blosc internal codec id 2).

    Pure-Python implementation of the PUBLIC snappy byte-stream format
    (google/snappy ``format_description.txt``; c-blosc's wrapper calls the
    raw ``snappy_uncompress``, not the framing format): a little-endian
    base-128 varint uncompressed length, then tagged elements. Tag low 2
    bits select: 0 = literal with 6-bit length-1 (values 60..63 escape to
    a 1-4 byte little-endian length-1); 1 = copy with 3-bit length-4 and
    an 11-bit offset (tag bits 5-7 high | next byte low); 2/3 = copy with
    6-bit length-1 and a 2/4-byte little-endian offset. Copies may
    overlap their output (RLE-style period copy); offset 0 is illegal.
    """
    n = len(data)
    ip = 0
    length = 0
    shift = 0
    while True:
        if ip >= n:
            raise ValueError("snappy stream truncated in its length varint")
        b = data[ip]
        ip += 1
        length |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
        if shift > 32:
            raise ValueError("snappy length varint overlong")
    if length != expected:
        raise ValueError(
            f"snappy stream declares {length} bytes, blosc block expects {expected}"
        )
    out = bytearray()
    while ip < n:
        tag = data[ip]
        ip += 1
        kind = tag & 3
        if kind == 0:  # literal run
            ln = tag >> 2
            if ln >= 60:  # escaped length in the next 1-4 bytes
                nb = ln - 59
                if ip + nb > n:
                    raise ValueError("snappy stream truncated in a literal length")
                ln = int.from_bytes(data[ip : ip + nb], "little")
                ip += nb
            ln += 1
            if ip + ln > n:
                raise ValueError("snappy stream truncated in a literal run")
            if len(out) + ln > expected:
                raise ValueError("snappy stream decodes past its declared size")
            out += data[ip : ip + ln]
            ip += ln
            continue
        if kind == 1:  # copy, 11-bit offset
            if ip >= n:
                raise ValueError("snappy stream truncated in a copy offset")
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[ip]
            ip += 1
        else:  # copy, 2- or 4-byte little-endian offset
            nb = 2 if kind == 2 else 4
            if ip + nb > n:
                raise ValueError("snappy stream truncated in a copy offset")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[ip : ip + nb], "little")
            ip += nb
        if off == 0 or off > len(out):
            raise ValueError("snappy copy reaches before the stream start")
        if len(out) + ln > expected:
            raise ValueError("snappy stream decodes past its declared size")
        src = len(out) - off
        # overlap-safe period copy (same doubling loop as blosclz above)
        while ln > 0:
            take = min(ln, len(out) - src)
            out += out[src : src + take]
            src += take
            ln -= take
    if len(out) != expected:
        raise ValueError(f"snappy stream decoded to {len(out)} bytes, expected {expected}")
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Encode one raw-format snappy stream (the layout the decoder above
    and real libsnappy's ``snappy_uncompress`` accept).

    Varint uncompressed-length preamble, then greedy hash-table LZ over
    the documented tag grammar: literal runs (inline 6-bit length, or the
    60/61 escapes for 1-/2-byte lengths; chunked at 65536 so the 3-/4-byte
    escapes are never needed) and copy-2 elements only — length 4..64,
    2-byte little-endian offset within a 65535-byte window; longer matches
    emit consecutive copy-2s at the same distance. Copy-1/copy-4 are legal
    output a conformant encoder may simply never produce (real snappy
    decoders must accept any mix). Cross-validated in tests against
    pyarrow's bundled REAL libsnappy decoder — non-circular evidence for
    the emitted byte stream, not just a self-roundtrip.
    """
    n = len(data)
    out = bytearray()
    # varint preamble
    v = n
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    lit_start = 0

    def flush(end: int) -> None:
        i = lit_start
        while i < end:
            run = min(65536, end - i)
            if run <= 60:
                out.append((run - 1) << 2)
            elif run <= 256:
                out.append(60 << 2)
                out.append(run - 1)
            else:
                out.append(61 << 2)
                out.extend((run - 1).to_bytes(2, "little"))
            out.extend(data[i : i + run])
            i += run

    table: dict[bytes, int] = {}
    i = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 65535:
            i += 1
            continue
        length = 4
        while i + length < n and data[cand + length] == data[i + length]:
            length += 1
        flush(i)
        off = (i - cand).to_bytes(2, "little")
        rem = length
        while rem > 0:
            take = min(64, rem)
            if rem - take in (1, 2, 3) and take == 64:
                take = 61  # keep every emitted copy >= 4 long
            out.append(((take - 1) << 2) | 2)
            out.extend(off)
            rem -= take
        for j in range(i + 1, min(i + length, n - 3)):
            table[data[j : j + 4]] = j
        i += length
        lit_start = i
    flush(n)
    return bytes(out)


def _nstreams(flags: int, typesize: int, neblock: int, blocksize: int) -> int:
    """Sub-streams per block, mirroring c-blosc ``blosc_d``: the header's
    'not split' bit wins; otherwise non-leftover blocks split into
    ``typesize`` streams when typesize <= 16 and blocksize/typesize >= 128.

    The typesize/blocksize conditions are deliberately kept alongside the
    flag: pre-1.14 c-blosc never wrote bit 4 (always clear) and split only
    under these conditions, so a flag-only decoder would mis-parse every
    old no-split chunk (e.g. zlib with typesize > 16); post-1.14 encoders
    only leave the flag clear when the conditions hold anyway
    (``split_block`` applies them in every split mode), so the conjunction
    is exact for both generations."""
    if flags & _DONT_SPLIT or typesize <= 1:
        return 1
    if (
        typesize <= _MAX_SPLITS
        and blocksize // typesize >= _MIN_BUFFERSIZE
        and neblock == blocksize  # the trailing leftover block never splits
    ):
        return typesize
    return 1


def decompress(chunk: bytes) -> bytes:
    if len(chunk) < HEADER_SIZE:
        raise ValueError(f"blosc chunk shorter than its 16-byte header ({len(chunk)})")
    version, _versionlz, flags, typesize, nbytes, blocksize, cbytes = _HEADER.unpack_from(chunk)
    if version < 1 or version > 2:
        raise ValueError(f"unsupported blosc format version {version}")
    if nbytes < 0 or cbytes < HEADER_SIZE or cbytes > len(chunk):
        raise ValueError(f"corrupt blosc header: nbytes={nbytes} cbytes={cbytes}")
    # the header is self-describing: cbytes bounds every offset/stream,
    # so trailing garbage after cbytes can never be dereferenced
    end = cbytes
    if nbytes == 0:
        return b""
    if flags & _MEMCPYED:
        # raw passthrough: filters were never applied on this path
        if cbytes != nbytes + HEADER_SIZE:
            raise ValueError("memcpyed blosc chunk with inconsistent cbytes")
        return bytes(chunk[HEADER_SIZE : HEADER_SIZE + nbytes])
    codec = (flags >> 5) & 0x7
    if codec not in (_CODEC_LZ4, _CODEC_ZLIB, _CODEC_BLOSCLZ, _CODEC_SNAPPY, _CODEC_ZSTD):
        raise NotImplementedError(
            f"blosc internal codec {_CODEC_NAMES.get(codec, codec)!r} is not "
            "supported by the pure-Python codec (blosclz, lz4, snappy, zlib and zstd are)"
        )
    zstd_codec = _zstd() if codec == _CODEC_ZSTD else None
    if codec == _CODEC_ZSTD and zstd_codec is None:
        raise NotImplementedError(
            "blosc internal codec 'zstd' needs pyarrow's bundled libzstd, "
            "which is unavailable in this environment (its FSE/Huffman "
            "entropy stages are out of pure-Python reach)"
        )
    if blocksize <= 0:
        raise ValueError(f"corrupt blosc header: blocksize={blocksize}")
    nblocks = -(-nbytes // blocksize)
    if HEADER_SIZE + 4 * nblocks > end:
        raise ValueError("blosc chunk truncated inside its offset table")
    offsets = struct.unpack_from(f"<{nblocks}i", chunk, HEADER_SIZE)
    out = bytearray()
    for i, off in enumerate(offsets):
        neblock = min(blocksize, nbytes - i * blocksize)
        nstreams = _nstreams(flags, typesize, neblock, blocksize)
        if neblock % nstreams:
            raise ValueError(
                f"split blosc block of {neblock} bytes not divisible into "
                f"{nstreams} streams (blocksize must be a typesize multiple)"
            )
        stream_size = neblock // nstreams
        # bounds-check BEFORE dereferencing: negative/aliasing offsets could
        # otherwise slice header bytes and decode to silently wrong data
        if off < HEADER_SIZE + 4 * nblocks or off + 4 > end:
            raise ValueError(f"blosc block offset {off} outside chunk bounds")
        pos = off
        block = bytearray()
        for _ in range(nstreams):
            if pos + 4 > end:
                raise ValueError("blosc chunk truncated inside a block's streams")
            (csize,) = struct.unpack_from("<i", chunk, pos)
            if csize < 0 or pos + 4 + csize > end:
                raise ValueError(f"blosc stream at {pos} claims {csize} bytes past chunk end")
            payload = chunk[pos + 4 : pos + 4 + csize]
            pos += 4 + csize
            if csize == stream_size:  # stored stream (did not compress)
                block += payload
            elif codec == _CODEC_LZ4:
                block += lz4_block_decompress(bytes(payload), stream_size)
            elif codec == _CODEC_BLOSCLZ:
                block += blosclz_decompress(bytes(payload), stream_size)
            elif codec == _CODEC_SNAPPY:
                block += snappy_decompress(bytes(payload), stream_size)
            elif codec == _CODEC_ZSTD:
                try:
                    part = zstd_codec.decompress(bytes(payload), stream_size, asbytes=True)
                except Exception as exc:  # ArrowInvalid etc -> decoder-total
                    raise ValueError(f"corrupt blosc zstd stream: {exc}") from None
                if len(part) != stream_size:
                    raise ValueError("blosc zstd stream decompressed to the wrong size")
                block += part
            else:
                part = _zlib.decompress(bytes(payload))
                if len(part) != stream_size:
                    raise ValueError("blosc zlib stream decompressed to the wrong size")
                block += part
        # filter dispatch mirrors blosc_d: byte-shuffle wins when flagged
        # with typesize > 1, else bit-shuffle; both flags set is a chunk
        # only pre-1.8 c-blosc could emit and is resolved the same way
        if flags & _SHUFFLE and typesize > 1:
            block = bytearray(_unshuffle(bytes(block), typesize))
        elif flags & _BITSHUFFLE:
            block = bytearray(_bitunshuffle(bytes(block), typesize))
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

    ``shuffle``: 0 none, 1 byte-shuffle, 2 bit-shuffle.
    ``blocksize`` 0 picks a default; it is rounded down to a multiple of
    ``typesize`` (``typesize * 8`` for bit-shuffle, matching c-blosc's
    ``compute_blocksize``) as the format requires for shuffled chunks.
    """
    if cname == "lz4hc":
        cname = "lz4"  # same stream format, same flag id
    if cname == "zstd" and _zstd() is None:
        raise NotImplementedError(
            "blosc cname 'zstd' needs pyarrow's bundled libzstd, which is "
            "unavailable in this environment; use lz4 or zlib"
        )
    if cname not in ("blosclz", "lz4", "snappy", "zlib", "zstd"):
        raise NotImplementedError(
            f"blosc cname {cname!r} is not a Blosc1 internal codec "
            "(blosclz, lz4, snappy, zlib and zstd are); or use the "
            "lz4/gzip/xz N5 codecs directly"
        )
    if shuffle not in (0, 1, 2):
        raise ValueError(f"shuffle must be 0 (none), 1 (byte) or 2 (bit), got {shuffle}")
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
    grain = typesize * 8 if shuffle == 2 else typesize
    blocksize = max(blocksize - blocksize % grain, grain)
    blocksize = min(blocksize, nbytes) if nbytes >= typesize else nbytes
    do_shuffle = shuffle == 1 and typesize > 1 and blocksize >= typesize
    do_bitshuffle = shuffle == 2 and blocksize >= typesize

    codec_id = {
        "blosclz": _CODEC_BLOSCLZ,
        "lz4": _CODEC_LZ4,
        "snappy": _CODEC_SNAPPY,
        "zlib": _CODEC_ZLIB,
        "zstd": _CODEC_ZSTD,
    }[cname]
    # blosc clevel 1-9 maps onto zstd's low levels; clamp to the same range
    # zlib uses so one knob means one thing across cnames
    zstd_codec = _zstd(min(max(clevel, 1), 9)) if cname == "zstd" else None
    nblocks = -(-nbytes // blocksize)
    body = bytearray()
    blocks: list[bytes] = []
    for i in range(nblocks):
        block = payload[i * blocksize : (i + 1) * blocksize]
        if do_shuffle:
            block = _shuffle(block, typesize)
        elif do_bitshuffle:
            block = _bitshuffle(block, typesize)
        if cname == "lz4":
            comp = lz4_block_compress(block)
        elif cname == "blosclz":
            comp = blosclz_compress(block)
        elif cname == "snappy":
            comp = snappy_compress(block)
        elif zstd_codec is not None:
            comp = zstd_codec.compress(block, asbytes=True)
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
    # bit 4 (not-split) is load-bearing: this encoder emits ONE stream per
    # block, and real c-blosc decoders otherwise assume typesize streams
    # whenever typesize>1 and blocksize/typesize >= 128 (split_block())
    flags = (codec_id << 5) | _DONT_SPLIT | (_SHUFFLE if do_shuffle else 0)
    if do_bitshuffle:
        flags |= _BITSHUFFLE
    header = _HEADER.pack(2, 1, flags, typesize, nbytes, blocksize, pos)
    body += struct.pack(f"<{nblocks}i", *offsets)
    for comp in blocks:
        body += struct.pack("<i", len(comp)) + comp
    return header + bytes(body)
