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


def _ome_xml(size_c, size_z, order, phys=None, size_t=1):
    phys_attrs = (
        f'PhysicalSizeX="{phys[0]}" PhysicalSizeY="{phys[1]}" '
        f'PhysicalSizeZ="{phys[2]}" PhysicalSizeXUnit="nm" '
        if phys
        else ""
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0"><Pixels ID="Pixels:0" '
        f'DimensionOrder="{order}" Type="uint16" SizeX="30" SizeY="20" '
        f'SizeC="{size_c}" SizeZ="{size_z}" SizeT="{size_t}" {phys_attrs}/>'
        "</Image></OME>"
    )


def test_parse_ome_xml():
    from n5_dask_spark.sources.ome import parse_ome_xml

    m = parse_ome_xml(_ome_xml(3, 4, "XYCZT", phys=(0.1, 0.2, 0.5)))
    assert (m.size_c, m.size_z, m.size_t) == (3, 4, 1)
    assert m.dim_order == "zc"  # C before Z -> C varies fastest across pages
    assert m.physical_size_xyz == [0.1, 0.2, 0.5] and m.physical_unit == "nm"
    assert parse_ome_xml(_ome_xml(2, 5, "XYZCT")).dim_order == "cz"
    assert parse_ome_xml(_ome_xml(2, 5, "XYZCT")).physical_size_xyz is None


def test_image_description_roundtrip():
    from n5_dask_spark.sources.tiff import encode_tiff_pages, read_image_description_file

    desc = _ome_xml(2, 3, "XYCZT")
    pages = [np.zeros((4, 4), dtype="u1")] * 6
    path = os.path.join(tempfile.gettempdir(), f"ome-{uuid.uuid4().hex[:6]}.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages(pages, description=desc))
    assert read_image_description_file(path) == desc
    # pages still decode identically with the extra tag present
    from n5_dask_spark.sources.tiff import decode_tiff_page

    buf = open(path, "rb").read()
    np.testing.assert_array_equal(decode_tiff_page(buf, 5), pages[5])


@pytest.mark.parametrize("order,dim_order", [("XYCZT", "zc"), ("XYZCT", "cz")])
def test_ome_tif_to_n5_dims_inferred_from_xml(spark, order, dim_order):
    """n_channels/dim_order derived from the embedded OME-XML, matching the
    reference's ome_types-driven parse (src/ometif_to_n5.py:34-74)."""
    from n5_dask_spark.sources.n5.metadata import read_attributes
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
        f.write(encode_tiff_pages(pages, description=_ome_xml(n_c, n_z, order, phys=(0.1, 0.1, 0.5))))

    out = temp_container()
    attrs = ome_tif_to_n5(spark, path, out, "img", [16, 16, 2], compression={"type": "gzip"})
    assert len(attrs) == n_c
    for c in range(n_c):
        got = read_full(spark, out, channel_dataset("img", c))
        np.testing.assert_array_equal(got, vol[c].transpose(2, 1, 0))
    stored = read_attributes(out, channel_dataset("img", 0))
    assert stored.extra["pixelResolution"] == {"unit": "nm", "dimensions": [0.1, 0.1, 0.5]}


def test_ome_time_series_rejected(spark):
    from n5_dask_spark.sources.ome import ome_tif_to_n5
    from n5_dask_spark.sources.tiff import encode_tiff_pages
    from n5_dask_spark.sources.n5.writer import temp_container

    pages = [np.zeros((4, 4), dtype="u2")] * 4
    path = os.path.join(tempfile.gettempdir(), f"ome-{uuid.uuid4().hex[:6]}.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages(pages, description=_ome_xml(2, 1, "XYCZT", size_t=2)))
    with pytest.raises(ValueError, match="SizeT"):
        ome_tif_to_n5(spark, path, temp_container(), "img", [4, 4, 1])


def test_short_image_description_is_inlined():
    """TIFF values of <= 4 bytes live inline in the IFD value field; a
    short description must roundtrip, not decode its own offset."""
    from n5_dask_spark.sources.tiff import encode_tiff_pages, read_image_description_file

    pages = [np.zeros((4, 4), dtype="u1")] * 2
    path = os.path.join(tempfile.gettempdir(), f"ome-{uuid.uuid4().hex[:6]}.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages(pages, description="ab"))
    assert read_image_description_file(path) == "ab"


def test_imagej_style_description_falls_back(spark):
    """A non-XML ImageDescription containing '<' (ImageJ free text) must
    take the legacy fallback when dims are explicit, not crash in the XML
    parser (ET.ParseError is a SyntaxError, not a ValueError)."""
    from n5_dask_spark.sources.n5.reader import read_full
    from n5_dask_spark.sources.ome import channel_dataset, ome_tif_to_n5
    from n5_dask_spark.sources.tiff import encode_tiff_pages
    from n5_dask_spark.sources.n5.writer import temp_container

    vol = make_volume(n_c=2, n_z=3)
    pages = [vol[c, z] for c in range(2) for z in range(3)]
    path = os.path.join(tempfile.gettempdir(), f"ome-{uuid.uuid4().hex[:6]}.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages(pages, description="threshold x<10 applied"))
    out = temp_container()
    attrs = ome_tif_to_n5(spark, path, out, "img", [16, 16, 2], n_channels=2)
    assert len(attrs) == 2
    np.testing.assert_array_equal(
        read_full(spark, out, channel_dataset("img", 0)), vol[0].transpose(2, 1, 0)
    )


def test_explicit_dims_still_capture_pixel_resolution(spark):
    """Passing n_channels/dim_order explicitly must not drop the OME
    PhysicalSize metadata from the written datasets."""
    from n5_dask_spark.sources.n5.metadata import read_attributes
    from n5_dask_spark.sources.ome import channel_dataset, ome_tif_to_n5
    from n5_dask_spark.sources.tiff import encode_tiff_pages
    from n5_dask_spark.sources.n5.writer import temp_container

    n_c, n_z = 2, 3
    vol = make_volume(n_c=n_c, n_z=n_z)
    pages = [vol[c, z] for c in range(n_c) for z in range(n_z)]
    path = os.path.join(tempfile.gettempdir(), f"ome-{uuid.uuid4().hex[:6]}.tif")
    with open(path, "wb") as f:
        f.write(
            encode_tiff_pages(pages, description=_ome_xml(n_c, n_z, "XYZCT", phys=(1.5, 1.5, 4.0)))
        )
    out = temp_container()
    ome_tif_to_n5(spark, path, out, "img", [16, 16, 2], n_channels=n_c, dim_order="cz")
    stored = read_attributes(out, channel_dataset("img", 0))
    assert stored.extra["pixelResolution"] == {"unit": "nm", "dimensions": [1.5, 1.5, 4.0]}


def test_ome_missing_xml_requires_explicit_dims(spark):
    from n5_dask_spark.sources.ome import ome_tif_to_n5
    from n5_dask_spark.sources.tiff import encode_tiff_pages
    from n5_dask_spark.sources.n5.writer import temp_container

    pages = [np.zeros((4, 4), dtype="u1")] * 4
    path = os.path.join(tempfile.gettempdir(), f"ome-{uuid.uuid4().hex[:6]}.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages(pages))
    with pytest.raises(ValueError, match="no OME-XML"):
        ome_tif_to_n5(spark, path, temp_container(), "img", [4, 4, 1])


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


# --- round-6 review regressions --------------------------------------------


def test_ome_time_series_rejected_even_with_explicit_args(spark):
    """Explicit n_channels/dim_order must NOT bypass the SizeT guard: the
    page->(c,z) mapping has no time axis, so any assignment would
    interleave channel and time data."""
    from n5_dask_spark.sources.ome import ome_tif_to_n5
    from n5_dask_spark.sources.n5.writer import temp_container
    from n5_dask_spark.sources.tiff import encode_tiff_pages

    pages = [np.zeros((4, 4), dtype="u2")] * 12
    path = os.path.join(tempfile.gettempdir(), f"ome-{uuid.uuid4().hex[:6]}.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages(pages, description=_ome_xml(2, 3, "XYZCT", size_t=2)))
    with pytest.raises(ValueError, match="SizeT"):
        ome_tif_to_n5(
            spark, path, temp_container(), "img", [4, 4, 1], n_channels=2, dim_order="cz"
        )


def test_ome_page_count_must_match_xml(spark):
    """A truncated file (fewer pages than SizeC x SizeZ) or an explicit
    n_channels contradicting SizeC must refuse, not scramble pages."""
    from n5_dask_spark.sources.ome import ome_tif_to_n5
    from n5_dask_spark.sources.n5.writer import temp_container
    from n5_dask_spark.sources.tiff import encode_tiff_pages

    # XML says 2x10=20 pages; file has 16 (divisible by 2 -> the old code
    # proceeded with n_z=8, assigning channel-0 z=8..9 pages to channel 1)
    pages = [np.zeros((4, 4), dtype="u2")] * 16
    path = os.path.join(tempfile.gettempdir(), f"ome-{uuid.uuid4().hex[:6]}.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages(pages, description=_ome_xml(2, 10, "XYCZT")))
    with pytest.raises(ValueError, match="truncated or inconsistent"):
        ome_tif_to_n5(spark, path, temp_container(), "img", [4, 4, 1])

    pages = [np.zeros((4, 4), dtype="u2")] * 12
    path2 = os.path.join(tempfile.gettempdir(), f"ome-{uuid.uuid4().hex[:6]}.tif")
    with open(path2, "wb") as f:
        f.write(encode_tiff_pages(pages, description=_ome_xml(3, 4, "XYCZT")))
    with pytest.raises(ValueError, match="contradicts"):
        ome_tif_to_n5(spark, path2, temp_container(), "img", [4, 4, 1], n_channels=2)


def test_ome_invalid_n_channels_refused(spark):
    from n5_dask_spark.sources.ome import ome_tif_to_n5
    from n5_dask_spark.sources.n5.writer import temp_container
    from n5_dask_spark.sources.tiff import encode_tiff_pages

    pages = [np.zeros((4, 4), dtype="u1")] * 4
    path = os.path.join(tempfile.gettempdir(), f"plain-{uuid.uuid4().hex[:6]}.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages(pages))  # no OME-XML: plain multi-page
    for bad in (0, -2):
        with pytest.raises(ValueError, match="positive int"):
            ome_tif_to_n5(spark, path, temp_container(), "img", [4, 4, 1], n_channels=bad)


def test_channel_dataset_empty_group_has_no_leading_slash():
    from n5_dask_spark.sources.ome import channel_dataset

    assert channel_dataset("", 0) == "c0/s0"
    assert channel_dataset("grp", 1) == "grp/c1/s0"
    assert channel_dataset("/grp/", 2, "s1") == "grp/c2/s1"
