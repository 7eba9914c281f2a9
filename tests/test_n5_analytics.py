"""Voxel-analytics queries vs numpy golden (the array->relational bridge)."""

from __future__ import annotations

import numpy as np

from tests.test_n5 import fixture_volume_xyz


def test_intensity_histogram_matches_numpy(spark):
    from n5_dask_spark.registry import load_all

    got = {r["bin"]: r["n_voxels"] for r in load_all()["n5_intensity_histogram"].fn(spark, "x").collect()}
    golden = fixture_volume_xyz()
    expect = np.bincount(golden.ravel() >> 4, minlength=16)
    for b in range(16):
        assert got.get(b, 0) == expect[b]
    assert sum(got.values()) == golden.size


def test_zprofile_matches_numpy(spark):
    from n5_dask_spark.registry import load_all

    rows = load_all()["n5_zprofile"].fn(spark, "x").collect()
    golden = fixture_volume_xyz()  # xyz
    assert len(rows) == golden.shape[2]
    for r in rows:
        z = r["z"]
        sl = golden[:, :, z]
        assert r["n_voxels"] == sl.size
        np.testing.assert_allclose(r["mean_intensity"], sl.mean(dtype="f8"), rtol=1e-12)
