"""Robustness: sparse datasets (absent block files = fill value), write
idempotency under task retries, and empty-input edges."""

from __future__ import annotations

import os

import numpy as np


def test_sparse_region_read(spark):
    """Deleting a block file must read back as zeros, not error."""
    from n5_dask_spark.sources.n5.reader import read_full, read_region
    from n5_dask_spark.sources.n5.writer import temp_container, write_array

    arr = np.arange(4 * 6 * 2, dtype="u1").reshape(4, 6, 2) + 1  # all nonzero
    c = temp_container()
    write_array(spark, arr, c, "a/s0", [2, 3, 2])  # 2x2x1 grid
    os.remove(f"{c}/a/s0/1/0/0")  # sparsify one block
    got = read_full(spark, c, "a/s0")
    expect = arr.copy()
    expect[2:4, 0:3, :] = 0  # gx=1, gy=0 block zone
    np.testing.assert_array_equal(got, expect)
    # region entirely inside the missing block -> pure fill
    hole = read_region(spark, c, "a/s0", [2, 0, 0], [4, 3, 2])
    assert hole.shape == (2, 3, 2) and (hole == 0).all()


def test_write_blocks_idempotent_rerun(spark):
    """Re-running the sink (the task-retry scenario) leaves identical bytes."""
    import glob
    import hashlib

    from n5_dask_spark.sources.n5.metadata import read_attributes
    from n5_dask_spark.sources.n5.reader import decoded_blocks
    from n5_dask_spark.sources.n5.writer import temp_container, write_array, write_blocks

    rng = np.random.default_rng(9)
    arr = (rng.random((20, 10, 4)) * 255).astype("u1")
    c = temp_container()
    write_array(spark, arr, c, "a/s0", [8, 8, 4])

    def digest() -> dict[str, str]:
        return {
            p: hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in sorted(glob.glob(f"{c}/a/s0/*/*/*"))
        }

    first = digest()
    blocks = decoded_blocks(spark, c, "a/s0")
    write_blocks(blocks.localCheckpoint(), c, "a/s0", read_attributes(c, "a/s0"))
    assert digest() == first  # same paths, same bytes — overwrite, no temp junk
    assert not glob.glob(f"{c}/a/s0/**/.inprogress-*", recursive=True)


def test_empty_tif_dir_errors(spark):
    import tempfile

    import pytest

    from n5_dask_spark.sources.tiff import tif_series_scan

    with pytest.raises(FileNotFoundError, match=r"no \*\.tif"):
        tif_series_scan(spark, tempfile.mkdtemp())
