"""Spark 4 Python DataSource tests: format('n5') scan + source-level region
pruning."""

from __future__ import annotations

import numpy as np

from tests.test_n5 import FIXTURE, FIXTURE_DS, fixture_volume_xyz


def test_n5_format_scan(spark):
    from n5_dask_spark.sources.n5.datasource import register_n5_source

    register_n5_source(spark)
    df = (
        spark.read.format("n5")
        .option("path", FIXTURE)
        .option("dataset", FIXTURE_DS)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 4
    by_grid = {(r.gx, r.gy, r.gz): r for r in rows}
    assert by_grid[(1, 1, 0)].shape_zyx == [27, 98, 58]
    arr = np.frombuffer(bytes(by_grid[(0, 0, 0)].data), dtype="u1").reshape(27, 128, 128)
    golden = fixture_volume_xyz().transpose(2, 1, 0)  # zyx
    np.testing.assert_array_equal(arr, golden[:27, :128, :128])


def test_n5_format_region_pruning(spark):
    from n5_dask_spark.sources.n5.datasource import register_n5_source

    register_n5_source(spark)
    df = (
        spark.read.format("n5")
        .option("path", FIXTURE)
        .option("dataset", FIXTURE_DS)
        .option("start", "0,0,0")
        .option("end", "64,64,27")
        .load()
    )
    assert df.rdd.getNumPartitions() == 1  # source planned exactly one block
    rows = df.collect()
    assert [(r.gx, r.gy, r.gz) for r in rows] == [(0, 0, 0)]


def test_n5_format_sql_over_blocks(spark):
    from n5_dask_spark.sources.n5.datasource import register_n5_source

    register_n5_source(spark)
    (
        spark.read.format("n5")
        .option("path", FIXTURE)
        .option("dataset", FIXTURE_DS)
        .load()
        .createOrReplaceTempView("n5_blocks")
    )
    got = spark.sql(
        "SELECT gx, gy, length(data) AS n_bytes FROM n5_blocks ORDER BY gx, gy"
    ).collect()
    assert [r.n_bytes for r in got] == [442368, 442368 * 98 // 128, 442368 * 58 // 128, 27 * 98 * 58]


def test_n5_format_write_roundtrip(spark):
    """df.write.format('n5'): read fixture blocks via the source, write them
    to a new container via the sink, byte-compare the volumes."""
    from n5_dask_spark.sources.n5.datasource import register_n5_source
    from n5_dask_spark.sources.n5.metadata import read_attributes, write_attributes
    from n5_dask_spark.sources.n5.reader import read_full
    from n5_dask_spark.sources.n5.writer import temp_container

    register_n5_source(spark)
    blocks = (
        spark.read.format("n5").option("path", FIXTURE).option("dataset", FIXTURE_DS).load()
    )
    out = temp_container()
    write_attributes(out, "copy/s0", read_attributes(FIXTURE, FIXTURE_DS))
    (
        blocks.write.format("n5")
        .option("path", out)
        .option("dataset", "copy/s0")
        .mode("append")
        .save()
    )
    np.testing.assert_array_equal(
        read_full(spark, out, "copy/s0"), fixture_volume_xyz()
    )


def test_n5_format_write_validates_schema(spark):
    import pytest

    from n5_dask_spark.sources.n5.datasource import register_n5_source

    register_n5_source(spark)
    bad = spark.range(3).selectExpr("CAST(id AS INT) AS gx")
    with pytest.raises(Exception, match="missing columns"):
        (
            bad.write.format("n5").option("path", "/tmp/x.n5").option("dataset", "a/s0")
            .mode("append").save()
        )
