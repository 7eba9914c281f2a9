"""Multichannel (OME-style) TIFF -> per-channel N5 datasets
(SURVEY.md §2.A S3 block-random-access scan + T6 channel split; reference
/root/reference/src/ometif_to_n5.py).

Shape of the computation (mirrors the reference's design, re-expressed on
DataFrames):
1. Driver-side metadata parse — page count, dimension order, per-page IFD
   offsets via SEEK-based reads (tiff_page_offsets_file; the analog of the
   reference's ome_types parse at src/ometif_to_n5.py:34-74). No pixel I/O
   on the driver, O(pages) small reads regardless of file size.
2. A page-index DataFrame (page, c, z) is the work spine (T11 grid
   enumeration); each executor task opens the file LOCALLY and decodes only
   its assigned pages (the `_get_block_data` random-access pattern,
   src/ometif_to_n5.py:174-182).
3. Per channel: slice-blocks -> the standard rechunk shuffle -> one task per
   output block writes `c{c}/s0` (channel groups as in
   src/ometif_to_n5.py:110-118).

Page order: dim_order 'cz' = page index p -> (c = p // n_z, z = p % n_z);
'zc' = (c = p % n_c, z = p // n_c). OME-XML would pin this; without XML
libs the caller supplies n_channels + dim_order explicitly.

Scale: the input file is read per-task via local/posix range reads (only
the strips of the assigned pages); at 100 TB input would be many OME-TIFFs
-> one spine DF over (file, page).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.session import tune_session
from n5_dask_spark.sources.n5.codec import data_type_of
from n5_dask_spark.sources.n5.metadata import DatasetAttributes
from n5_dask_spark.sources.n5.transforms import BLOCK_SCHEMA_DDL, rechunk
from n5_dask_spark.sources.n5.writer import write_blocks
from n5_dask_spark.sources.tiff import decode_tiff_page_file, tiff_page_offsets_file


def ome_tif_to_n5(
    spark: SparkSession,
    image_path: str,
    container: str,
    group: str,
    block_size: list[int],
    n_channels: int,
    dim_order: str = "cz",
    compression: dict[str, Any] | None = None,
    dataset: str = "s0",
) -> list[DatasetAttributes]:
    """Convert a multichannel multi-page TIFF into c{c}/{dataset} N5 volumes."""
    tune_session(spark)
    # Metadata walk via seeks: O(pages) small reads, NO pixel I/O on the
    # driver regardless of file size.
    endian, offsets = tiff_page_offsets_file(image_path)
    n_pages = len(offsets)
    if n_pages % n_channels:
        raise ValueError(f"{n_pages} pages not divisible by {n_channels} channels")
    n_z = n_pages // n_channels
    first = decode_tiff_page_file(image_path, offsets[0], endian)
    dims_xyz = [first.shape[1], first.shape[0], n_z]
    data_type = data_type_of(first.dtype)

    if dim_order == "cz":
        pages = [(p, offsets[p], p // n_z, p % n_z) for p in range(n_pages)]
    elif dim_order == "zc":
        pages = [(p, offsets[p], p % n_channels, p // n_channels) for p in range(n_pages)]
    else:
        raise ValueError("dim_order must be 'cz' or 'zc'")

    spine = spark.createDataFrame(pages, "page int, ifd long, c int, z int").repartition(
        max(1, spark.sparkContext.defaultParallelism), "page"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ifd, c, z in zip(pdf["ifd"], pdf["c"], pdf["z"]):
                # range reads: each task touches only its pages' strips
                arr = decode_tiff_page_file(image_path, int(ifd), endian)[None, :, :]
                rows.append((int(c), 0, 0, int(z), list(arr.shape), arr.tobytes()))
            yield pd.DataFrame(rows, columns=["c", "gx", "gy", "gz", "shape_zyx", "data"])

    # decode ONCE (persisted), then fan out per channel — the per-channel
    # rechunk jobs must not re-read and re-decode every page n_channels times
    slice_blocks = spine.mapInPandas(decode, schema="c int, " + BLOCK_SCHEMA_DDL).persist()
    try:
        slice_attrs = DatasetAttributes(
            data_type=data_type,
            dimensions=dims_xyz,
            block_size=[dims_xyz[0], dims_xyz[1], 1],
            compression=compression or {"type": "raw"},
        )
        out = []
        for c in range(n_channels):
            chan = slice_blocks.filter(F.col("c") == c).drop("c")
            blocks, attrs = rechunk(chan, slice_attrs, list(block_size))
            # empty group -> "c{c}/{dataset}", never a leading "/" (which
            # os.path.join would treat as an absolute path)
            ds = "/".join(p for p in (group.strip("/"), f"c{c}", dataset) if p)
            write_blocks(blocks, container, ds, attrs)
            out.append(attrs)
    finally:
        slice_blocks.unpersist()
    return out


def channel_dataset(group: str, c: int, dataset: str = "s0") -> str:
    """T6 channel select: path of one channel's dataset."""
    return f"{group}/c{c}/{dataset}"
