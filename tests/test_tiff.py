"""TIFF codec + TIFF<->N5 pipeline tests, including the README-equivalent
roundtrip (reference README.md:17-21): n5 -> tif series -> n5 re-chunked at
64^3 gzip -> values identical."""

from __future__ import annotations

import glob
import os
import tempfile
import uuid

import numpy as np
import pytest

from tests.test_n5 import FIXTURE, FIXTURE_DS, fixture_volume_xyz


def tmpdir() -> str:
    d = os.path.join(tempfile.gettempdir(), f"tifftest-{uuid.uuid4().hex[:8]}")
    os.makedirs(d)
    return d


def test_tiff_codec_roundtrip():
    from n5_dask_spark.sources.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(3)
    for dt in ("u1", "u2", "i2", "u4", "f4", "f8"):
        arr = (rng.random((13, 29)) * 100).astype(dt)
        out = decode_tiff(encode_tiff(arr))
        np.testing.assert_array_equal(out, arr)
        assert out.dtype == arr.dtype


def test_tiff_big_endian_decode():
    from n5_dask_spark.sources.tiff import decode_tiff, encode_tiff

    arr = np.arange(12, dtype="u2").reshape(3, 4)
    le = bytearray(encode_tiff(arr))
    # re-encode by hand as big-endian: decode must handle MM too
    import struct

    be = bytearray()
    data = arr.astype(">u2").tobytes()
    be += struct.pack(">2sHI", b"MM", 42, 8 + len(data))
    be += data
    entries = [(256, 3, 1, 4), (257, 3, 1, 3), (258, 3, 1, 16), (259, 3, 1, 1),
               (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 3, 1, 3),
               (279, 4, 1, len(data)), (339, 3, 1, 1)]
    be += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            be += struct.pack(">HHIHH", tag, typ, cnt, val, 0)
        else:
            be += struct.pack(">HHII", tag, typ, cnt, val)
    be += struct.pack(">I", 0)
    out = decode_tiff(bytes(be))
    np.testing.assert_array_equal(out, arr)
    assert decode_tiff(bytes(le)).dtype == np.dtype("u2")


def test_tiff_unsupported_features():
    from n5_dask_spark.sources.tiff import decode_tiff

    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"PK\x03\x04junk")


def test_n5_to_tif_series_and_back(spark):
    """The reference README smoke workflow, values byte-identical."""
    from n5_dask_spark.sources.n5.metadata import read_attributes
    from n5_dask_spark.sources.n5.reader import read_full
    from n5_dask_spark.sources.n5.writer import temp_container
    from n5_dask_spark.sources.tiff import n5_to_tif_series, read_tiff, tif_series_to_n5

    golden = fixture_volume_xyz()
    out_dir = tmpdir()
    n = n5_to_tif_series(spark, FIXTURE, FIXTURE_DS, out_dir)
    assert n == 27
    files = sorted(glob.glob(f"{out_dir}/*.tif"))
    assert len(files) == 27
    np.testing.assert_array_equal(read_tiff(files[5]), golden[:, :, 5].T)  # (y, x) raster

    c2 = temp_container()
    attrs = tif_series_to_n5(
        spark, out_dir, c2, "mri/c0/s0", [64, 64, 64], compression={"type": "gzip"}
    )
    assert attrs.dimensions == [186, 226, 27]
    assert read_attributes(c2, "mri/c0/s0").block_size == [64, 64, 64]
    np.testing.assert_array_equal(read_full(spark, c2, "mri/c0/s0"), golden)


def test_n5_region_to_tif(spark):
    from n5_dask_spark.sources.tiff import n5_region_to_tif, read_tiff

    golden = fixture_volume_xyz()
    out = os.path.join(tmpdir(), "block.tif")
    n5_region_to_tif(spark, FIXTURE, FIXTURE_DS, out, [10, 20, 7], [60, 90, 8])
    np.testing.assert_array_equal(read_tiff(out), golden[10:60, 20:90, 7].T)


def test_tif_dtype_cast_on_export(spark):
    from n5_dask_spark.sources.tiff import n5_to_tif_series, read_tiff

    out_dir = tmpdir()
    n5_to_tif_series(spark, FIXTURE, FIXTURE_DS, out_dir, dtype_override="uint16")
    arr = read_tiff(sorted(glob.glob(f"{out_dir}/*.tif"))[0])
    assert arr.dtype == np.dtype("u2")
    np.testing.assert_array_equal(arr, fixture_volume_xyz()[:, :, 0].T.astype("u2"))
    with pytest.raises(TypeError, match="unsafe"):
        n5_to_tif_series(spark, FIXTURE, FIXTURE_DS, tmpdir(), dtype_override="int8")
