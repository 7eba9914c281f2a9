from __future__ import annotations

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from n5_dask_spark.session import get_spark

    s = get_spark("n5_dask_spark-tests", cpus=8)
    yield s
    s.stop()


def snappy_varint(n: int) -> bytes:
    """Little-endian base-128 varint (the snappy raw-stream preamble).
    Shared by the snappy test-stream builders in test_n5 / test_properties."""
    out = b""
    while True:
        b, n = n & 0x7F, n >> 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out
