"""Pins the round-10 bench normalization fix (VERDICT r9 "What's wrong"
#1): an inflated calibration pass must never mint normalized times below
the raw time of a healthy pass. reduce_passes is pure, so no Spark here.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench


def test_r9_artifact_scenario_no_longer_deflates():
    """The literal r9 shape: one pass's calibration reads 2.2x ref while
    its query samples are ordinary; before the fix its scale 0.46 deflated
    those samples and won the cross-pass min (value_normalized 8.201 vs
    the ~11.0 honest steady state)."""
    passes = [
        (0.761, {"q": 1.10}),  # suspect pass: cal 2.2x ref, sample ordinary
        (0.401, {"q": 1.12}),
        (0.354, {"q": 1.15}),
        (0.335, {"q": 1.18}),
    ]
    raw, norm = bench.reduce_passes(passes, ["q"])
    assert raw["q"] == 1.10  # raw best still spans every pass
    # pre-fix: 1.10 * (0.35/0.761) = 0.506 would have won. Now the suspect
    # pass is excluded and the healthy passes' mild (<=1.4x) corrections
    # apply: best is 1.12 * (0.35/0.401) = 0.978.
    assert norm["q"] > 0.9
    assert abs(norm["q"] - 1.12 * (0.35 / 0.401)) < 1e-9


def test_fast_probe_cannot_inflate():
    """cal below ref clamps scale at 1.0: normalized == raw per sample."""
    raw, norm = bench.reduce_passes([(0.30, {"q": 2.0})], ["q"])
    assert norm["q"] == raw["q"] == 2.0


def test_uniformly_slow_vm_still_normalizes():
    """Every pass suspect -> whole-VM slowness, the case normalization
    exists for: all passes kept, drift divided out."""
    passes = [(0.70, {"q": 2.0}), (0.70, {"q": 2.2})]
    raw, norm = bench.reduce_passes(passes, ["q"])
    assert raw["q"] == 2.0
    assert abs(norm["q"] - 2.0 * (0.35 / 0.70)) < 1e-9


def test_normalized_never_below_any_healthy_raw_scaled():
    """Invariant: normalized best comes only from healthy passes and each
    contribution is <= its own raw (scale clamped at 1.0)."""
    passes = [
        (0.50, {"q": 1.0}),  # healthy-ish (1.43x ref is suspect at 1.4 -> excluded)
        (0.36, {"q": 1.3}),
        (0.34, {"q": 1.4}),
    ]
    raw, norm = bench.reduce_passes(passes, ["q"])
    # 0.50 > 1.4 * 0.35 = 0.49 -> first pass excluded from norm
    assert raw["q"] == 1.0
    assert abs(norm["q"] - 1.3 * (0.35 / 0.36)) < 1e-9


def test_healthy_pass_count():
    """r15: the [healthy, total] disclosure behind each *_normalized value.
    All-suspect degrades to 'all kept' exactly like reduce_passes does."""
    ref = bench.CAL_REFERENCE_SEC
    assert bench.healthy_pass_count([ref, ref * 2.2]) == 1
    assert bench.healthy_pass_count([ref, ref]) == 2
    assert bench.healthy_pass_count([ref * 2.2, ref * 3.0]) == 2  # all suspect: all kept
