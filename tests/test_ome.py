"""Multichannel OME-style pipeline tests: multi-page TIFF codec + per-channel
N5 conversion under both page orders."""

from __future__ import annotations

import os
import tempfile
import uuid

import numpy as np
import pytest


def make_volume(n_c=2, n_z=5, h=20, w=30, dtype="u2"):
    rng = np.random.default_rng(11)
    return (rng.random((n_c, n_z, h, w)) * 1000).astype(dtype)


def test_multipage_tiff_roundtrip():
    from n5_dask_spark.sources.tiff import decode_tiff_page, encode_tiff_pages, tiff_page_offsets

    vol = make_volume()
    pages = [vol[c, z] for c in range(2) for z in range(5)]
    buf = encode_tiff_pages(pages)
    _, offs = tiff_page_offsets(buf)
    assert len(offs) == 10
    for i, p in enumerate(pages):
        np.testing.assert_array_equal(decode_tiff_page(buf, i), p)
    with pytest.raises(IndexError):
        decode_tiff_page(buf, 10)


@pytest.mark.parametrize("dim_order", ["cz", "zc"])
def test_ome_tif_to_n5(spark, dim_order):
    from n5_dask_spark.sources.n5.reader import read_full
    from n5_dask_spark.sources.ome import channel_dataset, ome_tif_to_n5
    from n5_dask_spark.sources.tiff import encode_tiff_pages
    from n5_dask_spark.sources.n5.writer import temp_container

    n_c, n_z = 3, 4
    vol = make_volume(n_c=n_c, n_z=n_z)
    if dim_order == "cz":
        pages = [vol[c, z] for c in range(n_c) for z in range(n_z)]
    else:
        pages = [vol[c, z] for z in range(n_z) for c in range(n_c)]
    path = os.path.join(tempfile.gettempdir(), f"ome-{uuid.uuid4().hex[:6]}.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages(pages))

    out = temp_container()
    attrs = ome_tif_to_n5(
        spark, path, out, "img", [16, 16, 2], n_channels=n_c, dim_order=dim_order,
        compression={"type": "gzip"},
    )
    assert len(attrs) == n_c
    assert attrs[0].dimensions == [30, 20, n_z]
    for c in range(n_c):
        got = read_full(spark, out, channel_dataset("img", c))
        # got is xyz; vol[c] is (z, h, w) -> xyz = transpose(2,1,0)
        np.testing.assert_array_equal(got, vol[c].transpose(2, 1, 0))


def test_ome_bad_channel_count(spark):
    from n5_dask_spark.sources.ome import ome_tif_to_n5
    from n5_dask_spark.sources.tiff import encode_tiff_pages
    from n5_dask_spark.sources.n5.writer import temp_container

    pages = [np.zeros((4, 4), dtype="u1")] * 5
    path = os.path.join(tempfile.gettempdir(), f"ome-{uuid.uuid4().hex[:6]}.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages(pages))
    with pytest.raises(ValueError, match="not divisible"):
        ome_tif_to_n5(spark, path, temp_container(), "img", [4, 4, 1], n_channels=2)
