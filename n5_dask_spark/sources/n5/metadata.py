"""N5 container/dataset metadata (attributes.json) handling.

Reimplements the semantics the reference gets from zarr + its own helpers —
including a QUIRK-FREE version of `_get_pixel_resolution`
(/root/reference/src/n5_multiscale.py:37-60 reads the unit from
`pixel_res_attr.get('dimensions')` instead of `'unit'` and leaves
`pixel_res_values` unbound for non-dict/list attrs; documented in
SURVEY.md §1.4 — we fix both, we don't replicate them).

All metadata is x,y,z ordered on disk (`dimensions`, `blockSize`), matching
the fixture /root/reference/data/test.n5/mri/c0/s0/attributes.json.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Any

N5_VERSION = "2.5.1"
DEFAULT_PIXEL_RES_UNIT = "pixel"


@dataclass
class DatasetAttributes:
    data_type: str
    dimensions: list[int]  # x, y, z (fastest first), as stored on disk
    block_size: list[int]  # x, y, z
    compression: dict[str, Any] = field(default_factory=lambda: {"type": "raw"})
    extra: dict[str, Any] = field(default_factory=dict)  # pixelResolution etc.

    @property
    def ndim(self) -> int:
        return len(self.dimensions)

    @property
    def grid_shape(self) -> list[int]:
        """Blocks per dimension, x,y,z order."""
        return [math.ceil(d / b) for d, b in zip(self.dimensions, self.block_size)]

    @property
    def n_blocks(self) -> int:
        return int(math.prod(self.grid_shape))

    def block_dims(self, grid_pos: tuple[int, ...]) -> list[int]:
        """Actual (possibly truncated) dims of the block at grid_pos (x,y,z
        order both in and out). Edge blocks truncate, never pad."""
        return [
            min(b, d - g * b)
            for g, d, b in zip(grid_pos, self.dimensions, self.block_size)
        ]

    def to_json(self) -> dict[str, Any]:
        out = {
            "dataType": self.data_type,
            "dimensions": list(self.dimensions),
            "blockSize": list(self.block_size),
            "compression": dict(self.compression),
        }
        out.update(self.extra)
        return out

    @classmethod
    def from_json(cls, obj: dict[str, Any]) -> "DatasetAttributes":
        extra = {
            k: v
            for k, v in obj.items()
            if k not in ("dataType", "dimensions", "blockSize", "compression")
        }
        dims = list(obj["dimensions"])
        block = list(obj["blockSize"])
        if len(block) != len(dims):
            raise ValueError(
                f"attributes.json dimensions ({len(dims)}-d) and blockSize "
                f"({len(block)}-d) disagree"
            )
        # The engine's blocks schema carries three grid coordinates
        # (gx, gy, gz — reader.py/transforms.py), which covers every layout
        # the reference emits: it splits channels/time into per-channel 3-D
        # datasets c{c}/s{l} (/root/reference/src/ometif_to_n5.py:110-118)
        # rather than writing 4-D arrays. N5 legally allows ndim > 3, so a
        # foreign container must be refused loudly here instead of failing
        # with an obscure coordinate error deep in the scan.
        if len(dims) > 3:
            raise NotImplementedError(
                f"{len(dims)}-dimensional N5 datasets are not supported "
                "(ndim <= 3); split channel/time axes into per-channel "
                "3-D datasets (the reference's c{c}/s{level} layout)"
            )
        # validate dataType EAGERLY (r10 corrupt-metadata probe): an unknown
        # type used to pass attribute parsing and only fail at first decode/
        # encode, far from the metadata that caused it
        from n5_dask_spark.sources.n5.codec import np_dtype

        np_dtype(obj["dataType"])
        return cls(
            data_type=obj["dataType"],
            dimensions=dims,
            block_size=block,
            compression=obj.get("compression", {"type": "raw"}),
            extra=extra,
        )


def attributes_path(container: str, dataset: str = "") -> str:
    return os.path.join(container, dataset, "attributes.json") if dataset else os.path.join(
        container, "attributes.json"
    )


def _is_uri(path: str) -> bool:
    head = path.split("/", 1)[0]
    return head.endswith(":") and len(head) > 1


def _read_text(path: str) -> str | None:
    """File contents, or None if absent. Local paths read through the OS;
    URI-scheme paths (file:, hdfs:, s3a:, ...) read through the Hadoop
    FileSystem of the ACTIVE SparkSession (r11: before this, every
    metadata-reading operator — decoded_blocks, block_stats, read_region —
    failed on URI containers at open(), leaving only the raw scan
    URI-capable; now the whole READ surface works against object stores.
    The WRITE surface followed in r13 via fsio's per-scheme commit
    protocol — see sources/n5/fsio.py)."""
    if _is_uri(path):
        from pyspark.sql import SparkSession

        from n5_dask_spark.sources.n5 import fsio as _fsio

        if _fsio.is_emulated(path):
            # emulated object store (emustore.py): the JVM knows nothing
            # about the emulation — route around the Hadoop FS entirely
            data = _fsio.read_file(path)
            return None if data is None else data.decode("utf-8")
        spark = SparkSession.getActiveSession()
        if spark is None:
            # executor-side (no py4j bridge) or sessionless driver code:
            # read through fsio's pyarrow FileSystem instead of the
            # Hadoop FS (r13 — the DataSource sink reads attributes in
            # write tasks, where no active session exists)
            from n5_dask_spark.sources.n5 import fsio

            data = fsio.read_file(path)
            return None if data is None else data.decode("utf-8")
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        try:
            fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        except Exception as e:
            # the JVM has no connector for this scheme (e.g. s3 without
            # hadoop-aws jars, or a pyarrow-only/emulated store) — fall
            # back to fsio's pyarrow FileSystem, which the write path
            # already rides. Anything else (network, permissions) stays
            # loud: a broad fallback would mask real Hadoop failures.
            msg = f"{e} {getattr(e, 'java_exception', '')}"
            if "UnsupportedFileSystemException" not in msg and "No FileSystem for scheme" not in msg:
                raise
            data = _fsio.read_file(path)
            return None if data is None else data.decode("utf-8")
        if not fs.exists(p):
            return None
        stream = fs.open(p)
        try:
            data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
        return data.decode("utf-8")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return f.read()


def read_attributes(container: str, dataset: str) -> DatasetAttributes:
    path = attributes_path(container, dataset)
    text = _read_text(path)
    if text is None:
        raise FileNotFoundError(path)
    try:
        obj = json.loads(text)
    except json.JSONDecodeError as e:
        # name the FILE: a bare JSONDecodeError gives a fleet operator
        # nothing to act on (r10 corrupt-metadata probe)
        raise ValueError(f"corrupt attributes.json at {path}: {e}") from e
    return DatasetAttributes.from_json(obj)


def read_raw_attributes(container: str, dataset: str = "") -> dict[str, Any]:
    path = attributes_path(container, dataset)
    text = _read_text(path)
    if text is None:
        return {}
    try:
        return json.loads(text)
    except json.JSONDecodeError as e:
        raise ValueError(f"corrupt attributes.json at {path}: {e}") from e


# Write-session marker (r11 reader-during-write probe): present in a
# dataset directory exactly while a sink job is writing it, or forever
# after a writer died mid-job. Dot-named: invisible to Spark's hidden-file
# filter and to the numeric-path block scan, so it can never be read as
# data. Claimed/released by writer.write_blocks and the n5 DataSource
# sink; refused by the reader's scan audit.
INCOMPLETE_MARKER = ".n5ds-incomplete"


def current_umask() -> int:
    """The process umask (no read-only accessor exists; set-and-restore)."""
    u = os.umask(0)
    os.umask(u)
    return u


def _atomic_write_json(path: str, obj: Any) -> None:
    """Atomic metadata write (r10 concurrency hardening): same temp-file +
    os.replace discipline as the block sink. A plain truncating open("w")
    lets a concurrent reader — a downstream pyramid stage, a monitor, a
    racing retry of the same driver — observe an EMPTY or torn
    attributes.json; at fleet scale "two jobs touch one container" is
    routine (multiscale levels s0..sN land as separate jobs). With rename,
    readers see the old complete file or the new complete file, never a
    partial one; concurrent writers of identical content are idempotent.

    mkstemp creates 0600 files; the pre-r10 open("w") path produced
    umask-governed (typically 0644) metadata, and on shared containers a
    0600 attributes.json locks out group/other readers. fchmod restores
    the umask-governed mode before the rename (r10 advice).

    URI-scheme paths (r13, write-path URI lift) publish through fsio's
    per-scheme commit protocol — temp+move where rename is atomic, a
    single PUT where the object is — which preserves exactly the
    old-complete-or-new-complete visibility this function promises."""
    import tempfile

    if _is_uri(path):
        from n5_dask_spark.sources.n5 import fsio

        fsio.publish_file(path, json.dumps(obj).encode())
        return
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".inprogress-")
    try:
        with os.fdopen(fd, "w") as f:
            os.fchmod(f.fileno(), 0o666 & ~current_umask())
            json.dump(obj, f)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def write_attributes(container: str, dataset: str, attrs: DatasetAttributes) -> None:
    root = attributes_path(container)
    if _is_uri(container):
        from n5_dask_spark.sources.n5 import fsio

        # no makedirs: publish_file creates parents where the scheme needs
        # them (local/hdfs) and object stores need no directories at all
        if not fsio.exists(root):
            _atomic_write_json(root, {"n5": N5_VERSION})
        _atomic_write_json(attributes_path(container, dataset), attrs.to_json())
        return
    os.makedirs(os.path.join(container, dataset), exist_ok=True)
    if not os.path.exists(root):
        os.makedirs(container, exist_ok=True)
        _atomic_write_json(root, {"n5": N5_VERSION})
    _atomic_write_json(attributes_path(container, dataset), attrs.to_json())


def update_raw_attributes(container: str, dataset: str, updates: dict[str, Any]) -> None:
    path = attributes_path(container, dataset)
    obj = read_raw_attributes(container, dataset)
    obj.update(updates)
    if not _is_uri(path):  # URI publish creates parents itself (fsio)
        os.makedirs(os.path.dirname(path), exist_ok=True)
    _atomic_write_json(path, obj)


def get_pixel_resolution(
    attrs: dict[str, Any],
    default_values: list[float] | None = None,
    default_unit: str = DEFAULT_PIXEL_RES_UNIT,
    ndim: int = 3,
) -> tuple[list[float], str]:
    """-> (per-axis resolution values, unit).

    Accepts the dict form {"unit": ..., "dimensions": [...]}, the bare list
    form, or nothing (falls back to defaults). Unlike the reference
    (src/n5_multiscale.py:42), the unit comes from 'unit' and every branch
    binds the values.
    """
    pr = attrs.get("pixelResolution")
    if isinstance(pr, dict):
        values = [float(v) for v in pr.get("dimensions", default_values or [1.0] * ndim)]
        unit = str(pr.get("unit", default_unit))
    elif isinstance(pr, (list, tuple)):
        values = [float(v) for v in pr]
        unit = default_unit
    else:
        values = [float(v) for v in (default_values or [1.0] * ndim)]
        unit = default_unit
    return values, unit


def scaled_pixel_resolution(
    values: list[float], unit: str, downsampling_factors: list[float]
) -> dict[str, Any]:
    """pixelResolution attr for a downsampled level (reference scales by the
    cumulative factors, src/n5_multiscale.py:48-50)."""
    return {
        "unit": unit,
        "dimensions": [v * f for v, f in zip(values, downsampling_factors)],
    }
