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


def _testdata_snapshot() -> dict[str, tuple[int, int]]:
    """(size, mtime_ns) of every file under the base testdata SF dirs."""
    import os

    snap: dict[str, tuple[int, int]] = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        root = f"/root/testdata/{sf}"
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                snap[p] = (st.st_size, st.st_mtime_ns)
    return snap


@pytest.fixture(scope="session", autouse=True)
def sf_dir_immutable_guard():
    """Pin the catalog plan-cache contract (r15): the suite executes every
    registered query (oracle-parity sweep), and NONE of them may mutate
    the base testdata sf_dirs — the load_table DataFrame cache freezes the
    parquet file listing at first load, so a query writing into its sf_dir
    would serve stale listings to every later query in the session. All
    legitimate writes go to tempdirs / .testdata staging copies."""
    before = _testdata_snapshot()
    yield
    after = _testdata_snapshot()
    assert after == before, (
        "a test or registered query mutated /root/testdata: "
        + str(sorted(set(before.items()) ^ set(after.items()))[:5])
    )


def snappy_varint(n: int) -> bytes:
    """Little-endian base-128 varint (the snappy raw-stream preamble).
    Shared by the snappy test-stream builders in test_n5 / test_properties."""
    out = b""
    while True:
        b, n = n & 0x7F, n >> 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out
