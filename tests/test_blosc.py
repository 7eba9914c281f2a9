"""Pure-Python Blosc1 codec tests: header layout per the public chunk
format, hand-computed shuffle vectors, exhaustive roundtrips across
codec x shuffle x typesize x size (incl. multi-block, stored-block and
memcpy fallbacks), and the N5 write->read integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from n5_dask_spark.sources.n5 import blosc


# --- format-level vectors -------------------------------------------------


def test_header_layout_matches_public_spec():
    payload = bytes(range(64)) * 8  # 512 compressible bytes
    chunk = blosc.compress(payload, typesize=4, cname="zlib", shuffle=1)
    version, versionlz, flags, typesize, nbytes, blocksize, cbytes = struct.unpack_from(
        "<BBBBiii", chunk
    )
    assert version == 2
    assert typesize == 4
    assert nbytes == 512
    assert cbytes == len(chunk)
    assert flags & 0x1  # byte-shuffle bit
    assert not flags & 0x2  # not memcpyed
    assert (flags >> 5) & 0x7 == 3  # zlib internal codec id
    assert 0 < blocksize <= nbytes and blocksize % typesize == 0


def test_shuffle_hand_vector():
    # typesize 2 over elements (01,02)(03,04)(05,06): first bytes then second
    assert blosc._shuffle(b"\x01\x02\x03\x04\x05\x06", 2) == b"\x01\x03\x05\x02\x04\x06"
    assert blosc._unshuffle(b"\x01\x03\x05\x02\x04\x06", 2) == b"\x01\x02\x03\x04\x05\x06"
    # trailing remainder (7th byte) stays in place
    assert blosc._shuffle(b"\x01\x02\x03\x04\x05\x06\x07", 2) == b"\x01\x03\x05\x02\x04\x06\x07"


def test_empty_payload():
    chunk = blosc.compress(b"", typesize=8)
    assert len(chunk) == blosc.HEADER_SIZE
    assert blosc.decompress(chunk) == b""


def test_memcpy_fallback_on_incompressible_data():
    rng = np.random.default_rng(7)
    payload = rng.bytes(4096)  # random: nothing to compress
    chunk = blosc.compress(payload, typesize=4, cname="lz4", shuffle=1)
    flags = chunk[2]
    assert flags & 0x2  # memcpyed
    assert len(chunk) == blosc.HEADER_SIZE + len(payload)
    assert blosc.decompress(chunk) == payload


# --- roundtrips -----------------------------------------------------------


@pytest.mark.parametrize("cname", ["lz4", "zlib"])
@pytest.mark.parametrize("shuffle", [0, 1])
@pytest.mark.parametrize("typesize", [1, 2, 4, 8])
def test_roundtrip_matrix(cname, shuffle, typesize):
    rng = np.random.default_rng(hash((cname, shuffle, typesize)) % 2**32)
    for n in (1, 3, typesize, 1000, 4097):
        # low-entropy data (sorted small ints) so compression engages
        payload = np.sort(rng.integers(0, 5, n).astype(np.uint8)).tobytes()
        chunk = blosc.compress(payload, typesize=typesize, cname=cname, shuffle=shuffle)
        assert blosc.decompress(chunk) == payload


def test_multiblock_roundtrip():
    data = (np.arange(100_000, dtype=np.uint16) % 1000).tobytes()
    chunk = blosc.compress(data, typesize=2, cname="lz4", shuffle=1, blocksize=16_384)
    nblocks = -(-len(data) // 16_384)
    offsets = struct.unpack_from(f"<{nblocks}i", chunk, blosc.HEADER_SIZE)
    assert list(offsets) == sorted(offsets) and offsets[0] == blosc.HEADER_SIZE + 4 * nblocks
    assert blosc.decompress(chunk) == data


def test_stored_block_inside_compressed_chunk():
    # first half compressible, second half random: the random BLOCK is
    # stored (csize == neblock) while the chunk overall stays compressed
    rng = np.random.default_rng(11)
    data = b"\x00" * 8192 + rng.bytes(8192)
    chunk = blosc.compress(data, typesize=1, cname="lz4", shuffle=0, blocksize=8192)
    assert not chunk[2] & 0x2  # chunk itself is not memcpyed
    assert blosc.decompress(chunk) == data


def test_lz4hc_aliases_lz4_format():
    payload = b"abcd" * 512
    a = blosc.compress(payload, typesize=4, cname="lz4hc")
    assert (a[2] >> 5) & 0x7 == 1  # lz4 format id
    assert blosc.decompress(a) == payload


# --- unsupported variants fail loudly ------------------------------------


def test_unsupported_internal_codec_raises():
    payload = b"x" * 64
    chunk = bytearray(blosc.compress(payload, typesize=1, cname="zlib", shuffle=0))
    chunk[2] = (chunk[2] & 0x1F) | (0 << 5)  # flip codec id to blosclz
    with pytest.raises(NotImplementedError, match="blosclz"):
        blosc.decompress(bytes(chunk))
    with pytest.raises(NotImplementedError, match="cname"):
        blosc.compress(payload, cname="zstd")


def test_bitshuffle_rejected():
    payload = b"x" * 64
    chunk = bytearray(blosc.compress(payload, typesize=1, cname="zlib", shuffle=0))
    chunk[2] |= 0x4
    with pytest.raises(NotImplementedError, match="bit-shuffle"):
        blosc.decompress(bytes(chunk))
    with pytest.raises(NotImplementedError, match="shuffle"):
        blosc.compress(payload, shuffle=2)


def test_corrupt_headers_rejected():
    with pytest.raises(ValueError):
        blosc.decompress(b"\x00" * 8)  # truncated header
    good = blosc.compress(b"y" * 128, typesize=1, cname="zlib", shuffle=0)
    bad = bytearray(good)
    struct.pack_into("<i", bad, 12, 4)  # cbytes < header size
    with pytest.raises(ValueError):
        blosc.decompress(bytes(bad))


def test_corrupt_block_offsets_rejected():
    """Out-of-bounds and header-aliasing offsets must raise the module's
    documented ValueError, never struct.error or silently wrong bytes."""
    good = blosc.compress(b"z" * 512, typesize=1, cname="zlib", shuffle=0)
    for evil in (len(good) + 100, -4, 0):  # past end, negative, into header
        bad = bytearray(good)
        struct.pack_into("<i", bad, blosc.HEADER_SIZE, evil)
        with pytest.raises(ValueError, match="offset|bounds|past"):
            blosc.decompress(bytes(bad))


def test_clevel_zero_means_no_compression():
    # blosc semantics: clevel 0 opts out of compression -> memcpyed chunk
    payload = b"\x00" * 4096  # maximally compressible, still must memcpy
    chunk = blosc.compress(payload, typesize=4, cname="lz4", clevel=0, shuffle=1)
    assert chunk[2] & 0x2  # memcpyed flag
    assert len(chunk) == blosc.HEADER_SIZE + len(payload)
    assert blosc.decompress(chunk) == payload


# --- N5 codec integration -------------------------------------------------


def test_n5_codec_dispatch_roundtrip():
    from n5_dask_spark.sources.n5.codec import _compress, _decompress

    spec = {"type": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1, "typesize": 2}
    payload = (np.arange(10_000, dtype=np.uint16) % 300).tobytes()
    assert _decompress(_compress(payload, spec), spec) == payload


@pytest.mark.parametrize("shuffle", [0, 1])
def test_n5_container_roundtrip_blosc(spark, shuffle):
    """Full distributed write->read through the blosc codec — the same
    pipeline the gzip/lz4 roundtrips run, with blosc/lz4/byte-shuffle."""
    from n5_dask_spark.sources.n5.reader import read_full
    from n5_dask_spark.sources.n5.writer import temp_container, write_array

    # structured (compressible) values so the lz4 path engages rather than
    # every block taking the legal memcpy fallback; non-divisible dims
    arr = (np.arange(40 * 25 * 13, dtype=np.uint16) % 700).reshape(40, 25, 13)
    out = temp_container()
    comp = {
        "type": "blosc",
        "cname": "lz4",
        "clevel": 5,
        "shuffle": shuffle,
        "typesize": 2,
        "blocksize": 0,
    }
    write_array(spark, arr, out, "vol/s0", [16, 16, 16], compression=comp)
    np.testing.assert_array_equal(read_full(spark, out, "vol/s0"), arr)
    # the written block files really are blosc chunks (header sanity)
    import glob as _glob

    f = sorted(_glob.glob(f"{out}/vol/s0/*/*/*"))[0]
    raw = open(f, "rb").read()
    body = raw[16:]  # N5 block header (mode/ndim/dims) then the chunk
    assert body[0] == 2 and (body[2] >> 5) & 0x7 == 1  # blosc v2, lz4 codec
    # shuffle=1 with typesize=2 must actually set the filter bit in the
    # written chunks — the driver query's hash only covers shuffle if so
    assert bool(body[2] & 0x1) == (shuffle == 1)
