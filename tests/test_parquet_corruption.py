"""Parquet corruption probe — pinned lanes (r12, verdict direction (c)).

Census method (same as the N5 codec fuzz): one tiny single-column file,
EVERY strict-prefix truncation and EVERY per-byte bit flip classified
through the real Spark read path, in subprocess batches with hard
timeouts (a corrupted RLE header can put the vectorized reader into a
busy loop that ignores task cancellation — see below). Full-census
results (624-byte file, committed in SURVEY §2 round-12 notes):

- truncation: 624/624 RAISED — the footer-length + magic tail makes
  truncation never silent on the Spark parquet surface.
- bit flips, stock defaults: 67 SILENT-WRONG (the entire value-payload
  region 20-83 plus a tail run), 4 HUNG (offsets 99/123/132/145 — page
  header / def-level RLE bytes that send
  VectorizedRleValuesReader.readIntegers into a loop that survives
  sc.cancelAllJobs, i.e. a poisoned executor at fleet scale), the rest
  loud or don't-care.
- the SAME payload flips on a CRC-bearing file with
  parquet.page.verify-checksum.enabled=true: 64/64 RAISED. parquet-mr
  (and so every Spark-written file) stores page CRCs by default and
  Spark just never checks them — tune_session now turns verification
  on (session.py), closing the silent-payload lane for all
  checksummed data at one CRC32 per page.
- footer statistics have NO checksum: 6 byte flips in the row-group
  max field silently prune a pushed-down filter (WHERE k=5 -> 0 rows,
  no error) — FORMAT LIMIT, mitigation is store-level integrity, same
  class as the N5 raw-payload lane.

The tests below pin the actionable boundaries cheaply; the full census
lives in the probe scripts, not CI.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def crc_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pqcorrupt") / "crc.parquet")
    pq.write_table(
        pa.table({"k": list(range(8))}),
        p,
        compression="none",
        write_page_checksum=True,
    )
    return p


def _flip(path: str, out: str, offset: int, bit: int = 0) -> str:
    data = bytearray(open(path, "rb").read())
    data[offset] ^= 1 << bit
    open(out, "wb").write(bytes(data))
    return out


def _payload_offset(path: str) -> int:
    # the plain-encoded int64 value 5 is a unique byte pattern in the page
    return open(path, "rb").read().find((5).to_bytes(8, "little"))


def test_payload_flip_raises_under_engine_session(spark, crc_file, tmp_path):
    """The engine's session verifies page CRCs: a payload bit flip on a
    checksummed file must refuse loudly through tune_session defaults."""
    from n5_dask_spark.session import tune_session

    tune_session(spark)
    assert spark.conf.get("parquet.page.verify-checksum.enabled") == "true"
    bad = _flip(crc_file, str(tmp_path / "bad.parquet"), _payload_offset(crc_file))
    with pytest.raises(Exception):
        spark.read.parquet(bad).collect()


def test_payload_flip_is_silent_without_verification(spark, crc_file, tmp_path):
    """Characterize WHY the conf matters: stock behavior decodes the same
    flip to a wrong value with no error (the lane the probe found)."""
    bad = _flip(crc_file, str(tmp_path / "bad2.parquet"), _payload_offset(crc_file))
    rows = sorted(
        r["k"]
        for r in spark.read.option("parquet.page.verify-checksum.enabled", "false")
        .parquet(bad)
        .collect()
    )
    assert rows != list(range(8)) and len(rows) == 8, rows


def test_spark_written_parquet_carries_verifiable_checksums(spark, tmp_path):
    """Every file OUR sinks produce is protected end to end: Spark writes
    page CRCs by default, and the session verifies them on read."""
    from n5_dask_spark.session import tune_session

    tune_session(spark)
    out = str(tmp_path / "written")
    spark.range(8).selectExpr("id as k").coalesce(1).write.parquet(out)
    import glob as _glob

    f = _glob.glob(os.path.join(out, "*.parquet"))[0]
    bad = _flip(f, f, _payload_offset(f))
    with pytest.raises(Exception):
        spark.read.parquet(out).collect()


def test_truncation_sample_never_silent(spark, crc_file, tmp_path):
    """Sampled pin of the census's 624/624 result: every strict prefix
    raises (stride-32 plus the whole footer tail)."""
    data = open(crc_file, "rb").read()
    golden = list(range(8))
    offsets = sorted(set(range(0, len(data), 32)) | set(range(len(data) - 16, len(data))))
    p = str(tmp_path / "trunc.parquet")
    for klen in offsets:
        open(p, "wb").write(data[:klen])
        try:
            rows = sorted(r["k"] for r in spark.read.parquet(p).collect())
        except Exception:
            continue
        raise AssertionError(
            f"truncation at {klen}/{len(data)} bytes decoded without error: {rows}"
        )


def test_stats_corruption_prunes_silently_documented(spark, crc_file, tmp_path):
    """FORMAT LIMIT characterization: the row-group max statistic has no
    checksum; lowering it below a filtered value silently prunes the row
    even with page verification on. If this ever starts RAISING or
    returning the row, Spark grew stats protection — retire the limit."""
    from n5_dask_spark.session import tune_session

    tune_session(spark)
    data = bytearray(open(crc_file, "rb").read())
    # the footer stores max=7 as plain int64 twice (statistics + column
    # index); lower BOTH to 4 so either pruning path fires
    pat = (7).to_bytes(8, "little")
    hits = 0
    start = len(data) // 2  # stats live in the footer half
    i = data.find(pat, start)
    while i != -1:
        data[i] = 4
        hits += 1
        i = data.find(pat, i + 1)
    assert hits >= 1, "fixture layout changed: max=7 not found in footer"
    p = str(tmp_path / "stats.parquet")
    open(p, "wb").write(bytes(data))
    rows = [r["k"] for r in spark.read.parquet(p).where("k > 5").collect()]
    assert rows == [], (
        f"stats-corrupted filter returned {rows}: Spark now detects or "
        "ignores corrupt statistics — update the documented format limit"
    )
