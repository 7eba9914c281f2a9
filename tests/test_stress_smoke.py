"""Env-gated smoke for the N5 grid stress shape (reduced size).

Gated behind N5DS_STRESS=1 so the default gate stays fast; the full shape
(8192 blocks through rechunk + multiscale with balance assertions) runs in
``tools/stress.py`` per round.
"""

from __future__ import annotations

import importlib.util
import os

import pytest


def _stress_module():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "stress.py")
    spec = importlib.util.spec_from_file_location("n5ds_stress", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.environ.get("N5DS_STRESS"), reason="set N5DS_STRESS=1 to run")
def test_n5_grid_stress_smoke(spark, tmp_path):
    stress = _stress_module()
    out = stress.n5_grid_stress(spark, str(tmp_path), dims=(256, 256, 128), bs=(32, 32, 32))
    assert out["n5_grid_blocks"] == 8 * 8 * 4
    assert out["n5_grid_partition_max_over_median"] <= 10
    assert out["n5_grid_levels"] >= 3  # 256 -> 128 -> 64 -> 32 with 32^3 thumb


@pytest.mark.skipif(not os.environ.get("N5DS_STRESS"), reason="set N5DS_STRESS=1 to run")
def test_tiff_series_stress_smoke(spark, tmp_path):
    stress = _stress_module()
    out = stress.tiff_series_stress(spark, str(tmp_path), n_z=16, wh=(96, 80))
    assert out["tiff_series_slices"] == 16  # verify leg asserts the roundtrip


@pytest.mark.skipif(not os.environ.get("N5DS_STRESS"), reason="set N5DS_STRESS=1 to run")
def test_dedup_stress_smoke(spark, tmp_path):
    stress = _stress_module()
    out = stress.dedup_stress(spark, str(tmp_path), rows=80_000)  # 20k docs
    assert out["dedup_minhash_partition_max_over_median"] <= 10
    assert out["dedup_simhash_partition_max_over_median"] <= 10
    assert out["dedup_ngram_partition_max_over_median"] <= 10
    # planted 29-of-30-token near-dup pairs recovered by every family
    assert out["minhash_pairs"] and out["ngram_pairs"] and out["simhash_pairs"]


@pytest.mark.skipif(not os.environ.get("N5DS_STRESS"), reason="set N5DS_STRESS=1 to run")
def test_streaming_stress_smoke(spark, tmp_path):
    stress = _stress_module()
    out = stress.streaming_stress(spark, str(tmp_path), rows=200_000)
    assert out["streaming_20m_batches"] >= 2
    assert out["streaming_20m_t1"] > 0 and out["streaming_20m_t2"] > 0


@pytest.mark.skipif(not os.environ.get("N5DS_STRESS"), reason="set N5DS_STRESS=1 to run")
def test_streaming_state_stress_smoke(spark, tmp_path):
    stress = _stress_module()
    out = stress.streaming_state_stress(spark, str(tmp_path), rows=320_000)
    assert out["stream_state_rows_emitted"] > 0
    # the core claim: peak state ~ one slice's windows, not the full history
    assert 0 < out["stream_state_peak_rows"] <= 4 * 60
    assert out["stream_state_total_windows"] == 16 * 60


@pytest.mark.skipif(not os.environ.get("N5DS_STRESS"), reason="set N5DS_STRESS=1 to run")
def test_streaming_join_state_stress_smoke(spark, tmp_path):
    stress = _stress_module()
    out = stress.streaming_join_state_stress(spark, str(tmp_path), rows=320_000)
    assert out["stream_join_matches"] > 0
    # peak join state ~ one micro-batch (+ watermark horizon), not history
    assert 0 < out["stream_join_peak_state_rows"] <= 2 * (320_000 // 16)


@pytest.mark.skipif(not os.environ.get("N5DS_STRESS"), reason="set N5DS_STRESS=1 to run")
def test_similarity_lsh_stress_smoke(spark, tmp_path):
    stress = _stress_module()
    out = stress.similarity_lsh_stress(spark, str(tmp_path), n_vec=50_000, n_planted=500)
    assert out["lsh_planted_recall"] >= 0.85
    assert out["lsh_candidate_fraction"] < 1e-3  # candidates ~ buckets, not n^2
    assert out["lsh_bucket_max_over_mean"] <= 50  # Poisson tail at sparse smoke scale
