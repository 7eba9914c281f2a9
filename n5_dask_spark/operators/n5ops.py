"""N5 chunked-array operators exposed as driver-checkable queries
(SURVEY.md §2.A). These run against the reference's golden fixture
(/root/reference/data/test.n5 — read-only), independent of sf_dir, and are
deterministic; they carry no SQL oracle (the driver records rows-only
checks) but are golden-tested byte-level in tests/test_n5.py and
tests/test_tiff.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.registry import register

FIXTURE = "/root/reference/data/test.n5"
FIXTURE_DS = "mri/c0/s0"


@register(
    "n5_block_inventory",
    oracle=None,
    doc="S2: N5 dataset scan — one row per block file, grid coords from path.",
)
def n5_block_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from n5_dask_spark.sources.n5.reader import scan_block_files

    return (
        scan_block_files(spark, FIXTURE, FIXTURE_DS)
        .select("gx", "gy", "gz", "length")
        .orderBy("gx", "gy", "gz")
    )


@register(
    "n5_block_stats",
    oracle=None,
    doc="S2+T5: per-block decode + reduce inside an Arrow-batched UDF.",
)
def n5_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from n5_dask_spark.sources.n5.reader import block_stats

    return block_stats(spark, FIXTURE, FIXTURE_DS).orderBy("gx", "gy", "gz")


@register(
    "n5_region_read",
    oracle=None,
    doc=(
        "S4/T2: random-access region read with driver-side block pruning; "
        "returns per-z-slice sums of the region as rows."
    ),
)
def n5_region_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from n5_dask_spark.sources.n5.reader import read_region

    reg = read_region(spark, FIXTURE, FIXTURE_DS, [100, 100, 5], [150, 160, 20])  # xyz
    rows = [
        (z + 5, float(reg[:, :, z].sum(dtype="f8")), int(reg[:, :, z].max()))
        for z in range(reg.shape[2])
    ]
    return spark.createDataFrame(rows, "z int, slice_sum double, slice_max int")


@register(
    "n5_rechunk_stats",
    oracle=None,
    doc=(
        "T1: rechunk the fixture 128^3 -> 64^3 via the fragment shuffle and "
        "return per-target-block stats (content-preservation check: total "
        "sum equals the 128^3 total)."
    ),
)
def n5_rechunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from n5_dask_spark.sources.n5.metadata import read_attributes
    from n5_dask_spark.sources.n5.reader import decoded_blocks
    from n5_dask_spark.sources.n5.transforms import rechunk

    attrs = read_attributes(FIXTURE, FIXTURE_DS)
    out_blocks, out_attrs = rechunk(decoded_blocks(spark, FIXTURE, FIXTURE_DS), attrs, [64, 64, 64])
    dt = out_attrs.data_type

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from n5_dask_spark.sources.n5.codec import np_dtype

        for pdf in batches:
            rows = []
            for gx, gy, gz, shape, data in zip(
                pdf["gx"], pdf["gy"], pdf["gz"], pdf["shape_zyx"], pdf["data"]
            ):
                a = np.frombuffer(bytes(data), dtype=np_dtype(dt)).reshape(list(shape))
                rows.append((int(gx), int(gy), int(gz), int(a.size), float(a.sum(dtype="f8"))))
            yield pd.DataFrame(rows, columns=["gx", "gy", "gz", "n_elems", "vsum"])

    return (
        out_blocks.mapInPandas(stats, schema="gx int, gy int, gz int, n_elems long, vsum double")
        .orderBy("gx", "gy", "gz")
    )


@register(
    "n5_intensity_histogram",
    oracle=None,
    doc=(
        "Voxel-level analytics over the chunked array: per-block partial "
        "histograms (numpy bincount inside the UDF) -> groupBy(bin) merge. "
        "No voxel ever becomes a row; the shuffle carries n_bins rows per "
        "block — the scale-correct shape for 100 TB volumes."
    ),
)
def n5_intensity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from n5_dask_spark.sources.n5.metadata import read_attributes
    from n5_dask_spark.sources.n5.reader import scan_block_files
    from n5_dask_spark.sources.n5.codec import decode_block

    attrs = read_attributes(FIXTURE, FIXTURE_DS)
    data_type, compression = attrs.data_type, dict(attrs.compression)
    if data_type != "uint8":
        raise ValueError(f"histogram binning (>>4, 16 bins) assumes uint8, got {data_type}")
    n_bins = 16  # uint8 -> 16 bins of width 16

    def partial_hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc = np.zeros(n_bins, dtype="int64")
            for raw in pdf["raw"]:
                a = decode_block(bytes(raw), data_type, compression)
                acc += np.bincount(a.ravel() >> 4, minlength=n_bins)[:n_bins]
            yield pd.DataFrame({"bin": np.arange(n_bins, dtype="int32"), "n_voxels": acc})

    return (
        scan_block_files(spark, FIXTURE, FIXTURE_DS)
        .mapInPandas(partial_hist, schema="bin int, n_voxels long")
        .groupBy("bin")
        .agg(F.sum("n_voxels").alias("n_voxels"))
        .filter(F.col("n_voxels") > 0)
        .orderBy("bin")
    )


@register(
    "n5_zprofile",
    oracle=None,
    doc=(
        "Per-z-slice mean intensity: per-block partial (sum, count) by "
        "global z -> merge -> exact mean. The array->relational bridge: "
        "slice statistics as ordinary rows."
    ),
)
def n5_zprofile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from n5_dask_spark.sources.n5.metadata import read_attributes
    from n5_dask_spark.sources.n5.reader import scan_block_files
    from n5_dask_spark.sources.n5.codec import decode_block

    attrs = read_attributes(FIXTURE, FIXTURE_DS)
    data_type, compression = attrs.data_type, dict(attrs.compression)
    bz = attrs.block_size[2]

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for gz, raw in zip(pdf["gz"], pdf["raw"]):
                a = decode_block(bytes(raw), data_type, compression)
                sums = a.sum(axis=(1, 2), dtype="f8")  # f8: exact for ints, no truncation for floats
                counts = a.shape[1] * a.shape[2]
                for dz in range(a.shape[0]):
                    rows.append((int(gz) * bz + dz, float(sums[dz]), counts))
            yield pd.DataFrame(rows, columns=["z", "vsum", "n"])

    return (
        scan_block_files(spark, FIXTURE, FIXTURE_DS)
        .mapInPandas(partial, schema="z int, vsum double, n long")
        .groupBy("z")
        .agg((F.sum("vsum") / F.sum("n")).alias("mean_intensity"), F.sum("n").alias("n_voxels"))
        .orderBy("z")
    )


@register(
    "n5_downsample_stats",
    oracle=None,
    doc=(
        "T7: one windowed-mean downsample level (factors 2,2,2; block-local, "
        "no shuffle for the reduction) — per-block stats of s1."
    ),
)
def n5_downsample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from n5_dask_spark.sources.n5.metadata import read_attributes
    from n5_dask_spark.sources.n5.reader import decoded_blocks
    from n5_dask_spark.sources.n5.transforms import downsample

    attrs = read_attributes(FIXTURE, FIXTURE_DS)
    out_blocks, out_attrs = downsample(decoded_blocks(spark, FIXTURE, FIXTURE_DS), attrs, [2, 2, 2])

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from n5_dask_spark.sources.n5.codec import np_dtype

        for pdf in batches:
            rows = []
            for gx, gy, gz, shape, data in zip(
                pdf["gx"], pdf["gy"], pdf["gz"], pdf["shape_zyx"], pdf["data"]
            ):
                a = np.frombuffer(bytes(data), dtype=np_dtype(out_attrs.data_type)).reshape(list(shape))
                rows.append(
                    (int(gx), int(gy), int(gz), list(a.shape), float(a.mean(dtype="f8")), float(a.sum(dtype="f8")))
                )
            yield pd.DataFrame(rows, columns=["gx", "gy", "gz", "shape_zyx", "vmean", "vsum"])

    return (
        out_blocks.mapInPandas(
            stats, schema="gx int, gy int, gz int, shape_zyx array<int>, vmean double, vsum double"
        )
        .orderBy("gx", "gy", "gz")
    )
