"""Byte-bounded output framing for wide-row mapInPandas kernels.

The r11 Arrow-memory probe (third probe direction, VERDICT r10 #6): Spark
bounds the JVM->Python direction of a mapInPandas exchange by BYTES
(``spark.sql.execution.arrow.maxBytesPerBatch``, 64 MB default in Spark 4.1,
pinned in session.DEFAULT_CONFS) — but the Python->JVM direction has no such
bound: each pandas frame the kernel YIELDS becomes exactly one output
ArrowRecordBatch (pyspark/sql/pandas/serializers.py — the byte-aware output
slicer exists only for transformWithState). A kernel that accumulates one
frame per INPUT batch therefore emits output batches of
``64 MB x expansion_ratio``:

- block decode: compressed -> native voxels, ratio is the codec ratio
  (gzip'd sparse microscopy volumes routinely exceed 100x -> multi-GB
  batches, worker OOM or Arrow's 2 GiB-per-BinaryType-column offset limit);
- volume slicing (write_volume's make_blocks): input rows are ~12-byte grid
  coords, so ~10k rows arrive per input batch and the yielded frame holds
  10k x block_size bytes — at the reference-default 512-cube blocks
  (/root/reference/src/tif_to_n5.py:37) that is unbounded by ANY input-side
  knob;
- dtype cast: up to 8x widening (uint8 -> float64).

Fix: stream rows through :func:`bounded_frames`, which starts a new output
frame whenever the accumulated payload bytes reach a budget (default: the
same 64 MB as the input bound, env-tunable). Peak kernel memory becomes
``input_batch + budget + one_row`` instead of ``input_batch x ratio``.
Correctness is batch-boundary independent by construction (the full-registry
3-row / 7-row Arrow-batch invariance nets prove the consumers don't care),
so the budget only moves memory, never values; tests/test_udfbatch.py pins
both properties.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable, Iterator

import pandas as pd

# Mirrors spark.sql.execution.arrow.maxBytesPerBatch's 64 MB default so both
# directions of every wide-row exchange carry the same bound.
DEFAULT_OUT_BATCH_BYTES = 64 * 1024 * 1024


def out_batch_bytes() -> int:
    """Output-frame byte budget: SPARK_GRAFT_UDF_OUT_BATCH_BYTES or 64 MB.

    Read per kernel invocation (executor-side), so tests and constrained
    deployments can shrink it without rebuilding plans.
    """
    raw = os.environ.get("SPARK_GRAFT_UDF_OUT_BATCH_BYTES", "")
    try:
        v = int(raw)
    except ValueError:
        v = 0
    return v if v > 0 else DEFAULT_OUT_BATCH_BYTES


def bounded_frames(
    rows: Iterable[tuple],
    columns: list[str],
    row_bytes: Callable[[tuple], int],
    budget: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Pack row tuples into pandas frames of at most ~``budget`` payload bytes.

    ``rows`` is consumed lazily (one decoded row materialized at a time);
    ``row_bytes`` returns the dominant payload size of one row. A single row
    larger than the budget still ships — as its own 1-row frame (matching
    maxBytesPerBatch's one-oversized-record semantics). Emits nothing for an
    empty input; row order is preserved.
    """
    if budget is None:
        budget = out_batch_bytes()
    buf: list[tuple] = []
    acc = 0
    for row in rows:
        buf.append(row)
        acc += row_bytes(row)
        if acc >= budget:
            yield pd.DataFrame(buf, columns=columns)
            buf, acc = [], 0
    if buf:
        yield pd.DataFrame(buf, columns=columns)
