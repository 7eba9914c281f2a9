"""Scheme-dispatched filesystem primitives for the N5 WRITE path (r13).

The READ surface has been URI-capable since r11 (driver-side metadata via
the Hadoop FileSystem, block scans via Spark's binaryFile source). Writes
stayed local-only because the sinks' temp-file + ``os.replace`` commit
discipline doesn't transfer to object stores. This module lifts that with
a per-scheme commit protocol, chosen by what the target filesystem can
actually promise (reference parity: zarr's N5Store writes wherever fsspec
points it, /root/reference/src/tif_to_n5.py:29):

- **Rename-capable filesystems** (local ``file:``, HDFS): the classic
  temp-key PUT + atomic ``move`` — identical semantics to the os-based
  local path, so retried tasks overwrite and never interleave.
- **Object stores** (s3/s3a, gs, abfs): a single PUT *is* atomic at the
  object level — an object is never observable half-written — so blocks
  go straight to their final keys with no temp+promote copy. The torn
  state an object store CAN expose is a *partial dataset* (some keys PUT,
  some not, job died), and that is exactly the window the dataset-level
  ``.n5ds-incomplete`` write-session marker already fences: readers
  refuse while it exists, and a dead writer leaves it behind loudly.

Executor-side constraint: block writes run in Python workers, which have
no py4j bridge to the driver JVM, so the Hadoop FileSystem used by the
read path is unavailable there. ``pyarrow.fs`` is the executor-reachable
twin (Local/Hadoop/S3/GCS/Azure), and ``FileSystem.from_uri`` dispatches
per path, so one code path serves every scheme. FileSystem instances are
cached per (scheme, authority) per worker — S3 client setup is not free.

Marker exclusivity on object stores: ``O_EXCL`` doesn't exist there, so
``claim_marker_uri`` uses a write-then-read-back fence — write a unique
writer token, read the key back, and refuse unless OUR token survived.
Two racing writers both PUT; last-writer-wins means at most one reads its
own token back, so at most one proceeds (both may refuse; none proceed
unfenced). Correct on strongly-consistent stores (S3 is read-after-write
consistent since 2020; GCS/Azure/HDFS/local always were); an eventually-
consistent store could let two writers each read their own token during
the inconsistency window — documented residual, same class as every
non-CAS object-store lock.
"""

from __future__ import annotations

import os
import uuid

# pyarrow URI schemes: s3a/s3n are Hadoop spellings of s3; pyarrow's S3
# filesystem speaks the same API/keys, so map them through.
_SCHEME_MAP = {"s3a": "s3", "s3n": "s3"}

# object-level-atomic-PUT stores, by pyarrow FileSystem type_name: no
# temp+move needed (and move would be a non-atomic copy+delete there)
_PUT_ATOMIC_TYPES = {"s3", "gcs", "abfs", "az"}

_FS_CACHE: dict[tuple[str, str], object] = {}


def is_uri(path: str) -> bool:
    """True for scheme-prefixed paths (file:, hdfs://, s3a://, ...)."""
    head = path.split("/", 1)[0]
    return head.endswith(":") and len(head) > 1


def _resolve(path: str):
    """-> (pyarrow FileSystem, fs-local path) for a URI. The FileSystem is
    cached per worker by (scheme, authority) — building an S3/GCS client
    per block write is not free — and the fs-local path is derived
    directly (bucket stores root at the bucket, host stores at /), which
    matches ``FileSystem.from_uri``'s own path convention."""
    from urllib.parse import unquote, urlparse

    from pyarrow import fs as pafs

    scheme, rest = path.split(":", 1)
    mapped = _SCHEME_MAP.get(scheme)
    if mapped:
        path = f"{mapped}:{rest}"
        scheme = mapped
    u = urlparse(path)
    # bucket stores address keys as "bucket/key"; host/local stores as the
    # plain absolute path (from_uri convention, pinned in tests)
    if scheme in ("s3", "gs", "gcs"):
        p = f"{u.netloc}{unquote(u.path)}"
    else:
        p = unquote(u.path)
    key = (scheme, u.netloc)
    fs = _FS_CACHE.get(key)
    if fs is None:
        fs, _ = pafs.FileSystem.from_uri(path)
        _FS_CACHE[key] = fs
    return fs, p


def _put_atomic(fs) -> bool:
    return getattr(fs, "type_name", "") in _PUT_ATOMIC_TYPES


def publish_file(path: str, payload: bytes) -> None:
    """Publish one file at a URI path with never-torn visibility.

    Rename-capable FS: write ``.inprogress-<uuid>`` in the parent, then
    atomic move — a reader sees the old bytes or the new bytes, never a
    prefix, and a retried task's re-publish is a full overwrite. Object
    stores: direct PUT (atomic per object; the dot-named temp would cost
    an extra round-trip and the move would be copy+delete, *less* atomic
    than the PUT itself)."""
    fs, p = _resolve(path)
    if _put_atomic(fs):
        with fs.open_output_stream(p) as f:
            f.write(payload)
        return
    parent = p.rsplit("/", 1)[0]
    fs.create_dir(parent, recursive=True)
    tmp = f"{parent}/.inprogress-{uuid.uuid4().hex}"
    try:
        with fs.open_output_stream(tmp) as f:
            f.write(payload)
        fs.move(tmp, p)
    except BaseException:
        try:
            fs.delete_file(tmp)
        except OSError:
            pass  # temp never landed, or the move already consumed it
        raise


def exists(path: str) -> bool:
    from pyarrow import fs as pafs

    f, p = _resolve(path)
    return f.get_file_info(p).type != pafs.FileType.NotFound


def read_file(path: str) -> bytes | None:
    """File contents, or None if absent (no-session twin of metadata's
    Hadoop-FS ``_read_text`` — usable executor-side and in claim fences)."""
    from pyarrow import fs as pafs

    f, p = _resolve(path)
    if f.get_file_info(p).type == pafs.FileType.NotFound:
        return None
    with f.open_input_stream(p) as stream:
        return stream.readall()


def delete_file(path: str) -> None:
    from pyarrow import fs as pafs

    f, p = _resolve(path)
    if f.get_file_info(p).type != pafs.FileType.NotFound:
        f.delete_file(p)


def make_dirs(path: str) -> None:
    """mkdir -p; a no-op on object stores (keys need no directories)."""
    fs, p = _resolve(path)
    fs.create_dir(p, recursive=True)


def claim_marker_uri(marker_path: str) -> str:
    """Claim a write-session marker at a URI path; returns the marker path.

    Protocol (see module doc): refuse if the marker exists; PUT a unique
    writer token; read back and refuse unless our token survived. The
    token names pid + a uuid so the refusal message and any post-mortem
    can identify the surviving writer."""
    token = f"writer pid {os.getpid()} token {uuid.uuid4().hex}\n".encode()
    if exists(marker_path):
        raise RuntimeError(
            f"refusing to write: write-session marker {marker_path} already "
            "exists — either another writer is mid-job on this dataset "
            "(concurrent same-dataset writers are refused up front) or a "
            "previous writer died leaving the dataset incomplete. If the "
            "previous writer is known dead, delete the marker; the dataset "
            "may be partially written — prefer re-creating it from source."
        )
    publish_file(marker_path, token)
    survived = read_file(marker_path)
    if survived != token:
        raise RuntimeError(
            f"lost the write-session claim race at {marker_path}: another "
            f"writer's token landed last ({(survived or b'').decode(errors='replace').strip()!r}). "
            "This dataset has a live concurrent writer; retry after it "
            "finishes."
        )
    return marker_path
