"""r14 probe: eventual-consistency windows on the object-store write fence.

The fsio module doc discloses the residual honestly: without a conditional
write, the marker fence is best-effort, and on a store whose reads lag its
PUTs the windows widen. This module turns that disclosure into pinned
behavior with a delayed-visibility variant of the emulated store — each
key can be given a replica lag measured in VISIBILITY PROBES (metadata
lookups / reads), so every lane is deterministic, no wall-clock races.

What is pinned:

- A writer whose own marker PUT is not yet readable refuses LOUDLY (the
  ``survived is None`` branch of ``claim_marker_uri``), with a message that
  names the eventual-consistency reading and the manual-cleanup path — it
  must never proceed unfenced, and must never delete the key (it may
  already hold a rival's live claim). The marker surfacing later as litter
  is the documented price of no conditional write.
- Within the visibility window a reader CAN plan a silent partial snapshot
  — marker invisible to its replica, one block invisible too. That is the
  disclosed residual, pinned here as characterization so a future
  conditional-write or read-repair change has a lane to flip; one probe
  later the same reader refuses on the now-visible marker.

Real-store context: S3 has been strongly read-after-write consistent since
2020 and GCS/Azure always were (emustore module doc), so these lanes model
legacy/alternative stores and caches — the fence's weakest supported
environment, not its expected one.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyarrow import fs as pafs

from n5_dask_spark.sources.n5 import emustore, fsio
from n5_dask_spark.sources.n5.datasource import N5Reader
from n5_dask_spark.sources.n5.metadata import INCOMPLETE_MARKER


class EventuallyConsistentHandler(emustore.EmuObjectStoreHandler):
    """Emulated store whose reads can lag PUTs by a per-key probe count.

    ``lag(key, n)`` makes the key report NotFound to the next ``n``
    visibility probes (get_file_info, listing walk, open_input_stream) —
    replica lag with deterministic, test-controlled extent.
    """

    def __init__(self, root: str):
        super().__init__(root)
        self._lag: dict[str, int] = {}

    def lag(self, key: str, probes: int) -> None:
        self._lag[key.strip("/")] = probes

    def _consume(self, key: str) -> bool:
        k = key.strip("/")
        n = self._lag.get(k, 0)
        if n > 0:
            self._lag[k] = n - 1
            return True
        return False

    def _info(self, key: str) -> pafs.FileInfo:
        if self._consume(key):
            return pafs.FileInfo(key.strip("/"), pafs.FileType.NotFound)
        return super()._info(key)

    def open_input_stream(self, path):
        if self._consume(path):
            raise FileNotFoundError(path)
        return super().open_input_stream(path)


@pytest.fixture
def ec(tmp_path):
    """(bucket, handler): a delayed-visibility store wired into fsio."""
    bucket = f"b{os.urandom(4).hex()}"
    root = tmp_path / "store"
    root.mkdir()
    handler = EventuallyConsistentHandler(str(root))
    fsio._FS_CACHE[("s3", bucket)] = pafs.PyFileSystem(handler)
    try:
        yield bucket, handler
    finally:
        fsio._FS_CACHE.pop(("s3", bucket), None)
        emustore.BEFORE_PUT_HOOKS.clear()
        emustore.AFTER_PUT_HOOKS.clear()


_ATTRS = {
    "dimensions": [16, 16, 8],
    "blockSize": [8, 8, 4],
    "dataType": "uint8",
    "compression": {"type": "raw"},
}


def _stage(bucket: str, blocks: list[str]) -> str:
    container = f"s3://{bucket}/vol.n5"
    fsio.publish_file(f"{container}/d/s0/attributes.json", json.dumps(_ATTRS).encode())
    payload = np.full((4, 8, 8), 9, np.uint8).tobytes()
    header = (
        (0).to_bytes(2, "big") + (3).to_bytes(2, "big")
        + b"".join(n.to_bytes(4, "big") for n in (8, 8, 4))
    )
    for g in blocks:
        fsio.publish_file(f"{container}/d/s0/{g}", header + payload)
    return container


def test_claim_refuses_loudly_when_own_put_is_invisible(ec):
    """Replica lag on the writer's OWN read-back: the claim must refuse —
    never proceed unfenced — and say why in eventual-consistency terms."""
    bucket, handler = ec
    marker = f"s3://{bucket}/vol.n5/d/s0/{INCOMPLETE_MARKER}"
    key = f"{bucket}/vol.n5/d/s0/{INCOMPLETE_MARKER}"

    def lag_fresh_put(k, payload):
        if INCOMPLETE_MARKER in k:
            handler.lag(key, 1)  # the next probe (our read-back) misses

    emustore.AFTER_PUT_HOOKS.append(lag_fresh_put)
    with pytest.raises(RuntimeError, match="could not read its own token back"):
        fsio.claim_marker_uri(marker)
    emustore.AFTER_PUT_HOOKS.clear()
    # the PUT eventually surfaces: documented litter, deliberately NOT
    # deleted by the failed claimer (the key could hold a rival's claim)
    assert fsio.exists(marker)
    # and litter behaves as litter should: the next writer is refused up
    # front by the precheck, and deleting the marker reopens the dataset
    with pytest.raises(RuntimeError, match="marker .* already"):
        fsio.claim_marker_uri(marker)
    fsio.delete_file(marker)
    assert fsio.claim_marker_uri(marker) == marker


def test_claim_failure_message_names_manual_cleanup(ec):
    """The refusal must hand the operator the recovery path (delete the
    marker once no writer is live) — on an EC store there is no automatic
    one."""
    bucket, handler = ec
    marker = f"s3://{bucket}/x.n5/d/s0/{INCOMPLETE_MARKER}"

    def lag_fresh_put(k, payload):
        if INCOMPLETE_MARKER in k:
            handler.lag(f"{bucket}/x.n5/d/s0/{INCOMPLETE_MARKER}", 1)

    emustore.AFTER_PUT_HOOKS.append(lag_fresh_put)
    with pytest.raises(RuntimeError, match="delete the marker before retrying"):
        fsio.claim_marker_uri(marker)


def test_reader_partial_snapshot_inside_visibility_window(ec):
    """CHARACTERIZATION of the disclosed residual: a reader whose replica
    has not yet seen the marker (and is missing one block) plans a silent
    partial snapshot. One probe later the marker is visible and the same
    reader refuses. Flipping the first half of this lane requires a
    conditional write or read-repair the platform does not expose — if a
    future change closes it, update this pin to the refusal."""
    bucket, handler = ec
    container = _stage(bucket, ["0/0/0", "1/0/0", "0/1/0"])
    marker = f"{container}/d/s0/{INCOMPLETE_MARKER}"
    assert fsio.claim_marker_uri(marker) == marker  # strong store: claim ok

    # reader's replica lags: marker invisible for 1 probe, one block too
    handler.lag(f"{bucket}/vol.n5/d/s0/{INCOMPLETE_MARKER}", 1)
    handler.lag(f"{bucket}/vol.n5/d/s0/1/0/0", 1)
    reader = N5Reader({"path": container, "dataset": "d/s0"})
    parts = reader.partitions()
    assert len(parts) == 2  # THE RESIDUAL: partial snapshot, silently

    # replica caught up: the very next plan refuses on the marker
    with pytest.raises(ValueError, match="write-session marker"):
        N5Reader({"path": container, "dataset": "d/s0"}).partitions()

    # writer released: full dataset, all three blocks
    fsio.delete_file(marker)
    assert len(N5Reader({"path": container, "dataset": "d/s0"}).partitions()) == 3


def test_rival_overwrite_still_names_the_survivor(ec):
    """The survived-token branch is unchanged by the None-branch split:
    a rival whose PUT lands between ours and our read-back is named."""
    bucket, handler = ec
    marker = f"s3://{bucket}/y.n5/d/s0/{INCOMPLETE_MARKER}"

    def rival_put(k, payload):
        if INCOMPLETE_MARKER in k and b"rival" not in payload:
            emustore.AFTER_PUT_HOOKS.clear()  # once
            fsio.publish_file(marker, b"writer pid 424242 token rival\n")

    emustore.AFTER_PUT_HOOKS.append(rival_put)
    with pytest.raises(RuntimeError, match="rival"):
        fsio.claim_marker_uri(marker)
