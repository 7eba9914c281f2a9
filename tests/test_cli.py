"""CLI surface tests: the reference-workflow commands end-to-end.

In-process main(argv) drives the full orchestration (arg parsing included)
against the session fixture; getOrCreate reuses it so each command doesn't
boot a JVM."""

from __future__ import annotations

import glob
import json
import os
import tempfile
import uuid

import numpy as np

from tests.test_n5 import FIXTURE, FIXTURE_DS, fixture_volume_xyz


def tdir(name: str) -> str:
    d = os.path.join(tempfile.gettempdir(), f"cli-{name}-{uuid.uuid4().hex[:6]}")
    os.makedirs(d, exist_ok=True)
    return d


def test_cli_readme_workflow(spark, capsys):
    """The reference README smoke (README.md:17-21) via our CLI verbs:
    n5-to-tif -> tif-to-n5 (64^3 gzip) -> n5-multiscale."""
    from n5_dask_spark.cli import main
    from n5_dask_spark.sources.n5.reader import read_full

    tif_dir = tdir("tifs")
    assert main(["n5-to-tif", "-i", FIXTURE, "-d", FIXTURE_DS, "-o", tif_dir]) == 0
    assert json.loads(capsys.readouterr().out)["slices"] == 27

    n5_out = os.path.join(tdir("n5"), "out.n5")
    assert (
        main(
            [
                "tif-to-n5", "-i", tif_dir, "-o", n5_out, "-d", "/mri/c0/s0",
                "-c", "64,64,64", "--compression", "gzip",
            ]
        )
        == 0
    )
    meta = json.loads(capsys.readouterr().out)["attributes"]
    assert meta["dimensions"] == [186, 226, 27] and meta["blockSize"] == [64, 64, 64]
    np.testing.assert_array_equal(read_full(spark, n5_out, "mri/c0/s0"), fixture_volume_xyz())

    assert main(["n5-multiscale", "-i", n5_out, "-d", "mri/c0"]) == 0
    assert json.loads(capsys.readouterr().out)["levels"] == ["s0", "s1", "s2"]
    assert os.path.exists(f"{n5_out}/mri/c0/s2/attributes.json")


def test_cli_create_and_info(spark, capsys):
    from n5_dask_spark.cli import main

    out = os.path.join(tdir("tpl"), "new.n5")
    assert (
        main(
            [
                "create-n5", "-o", out, "-d", "copy/s0", "-t", FIXTURE,
                "--template_data_set", FIXTURE_DS, "--compression", "raw",
            ]
        )
        == 0
    )
    created = json.loads(capsys.readouterr().out)
    assert created["attributes"]["compression"] == {"type": "raw"}

    assert main(["n5-info", "-i", FIXTURE, "-d", FIXTURE_DS, "--start", "0,0,0", "--end", "10,10,2"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["attributes"]["dataType"] == "uint8"
    assert info["region"]["shape_xyz"] == [10, 10, 2]


def test_cli_region_export(spark, capsys):
    from n5_dask_spark.cli import main
    from n5_dask_spark.sources.tiff import read_tiff

    out = os.path.join(tdir("reg"), "reg.tif")
    assert (
        main(["n5-to-tif", "-i", FIXTURE, "-d", FIXTURE_DS, "-o", out, "--start", "5,6,3", "--end", "25,30,4"]) == 0
    )
    capsys.readouterr()
    np.testing.assert_array_equal(read_tiff(out), fixture_volume_xyz()[5:25, 6:30, 3].T)


def test_cli_ometif(spark, capsys):
    from n5_dask_spark.cli import main
    from n5_dask_spark.sources.tiff import encode_tiff_pages
    from n5_dask_spark.sources.n5.reader import read_full

    rng = np.random.default_rng(5)
    vol = (rng.random((2, 3, 10, 12)) * 255).astype("u1")
    path = os.path.join(tdir("ome"), "img.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages([vol[c, z] for c in range(2) for z in range(3)]))
    out = os.path.join(tdir("omen5"), "img.n5")
    assert (
        main(["ometif-to-n5", "-i", path, "-o", out, "-g", "img", "-c", "8,8,2", "--n_channels", "2"]) == 0
    )
    assert json.loads(capsys.readouterr().out)["channels"] == 2
    np.testing.assert_array_equal(read_full(spark, out, "img/c1/s0"), vol[1].transpose(2, 1, 0))


def test_cli_ometif_default_group_stays_in_container(spark, capsys):
    """Empty --group must not produce an absolute '/c0/s0' path."""
    from n5_dask_spark.cli import main
    from n5_dask_spark.sources.tiff import encode_tiff_pages
    from n5_dask_spark.sources.n5.reader import read_full

    vol = (np.arange(2 * 2 * 4 * 6) % 251).astype("u1").reshape(2, 2, 4, 6)
    path = os.path.join(tdir("omeg"), "img.tif")
    with open(path, "wb") as f:
        f.write(encode_tiff_pages([vol[c, z] for c in range(2) for z in range(2)]))
    out = os.path.join(tdir("omegn5"), "img.n5")
    assert main(["ometif-to-n5", "-i", path, "-o", out, "-c", "4,4,2", "--n_channels", "2"]) == 0
    capsys.readouterr()
    assert os.path.exists(f"{out}/c0/s0/attributes.json")  # inside the container
    np.testing.assert_array_equal(read_full(spark, out, "c1/s0"), vol[1].transpose(2, 1, 0))


def test_cli_argument_validation(spark, capsys):
    import pytest

    from n5_dask_spark.cli import main

    from tests.test_n5 import FIXTURE, FIXTURE_DS

    with pytest.raises(SystemExit):  # lone --start
        main(["n5-to-tif", "-i", FIXTURE, "-d", FIXTURE_DS, "-o", "/tmp/x.tif", "--start", "0,0,0"])
    with pytest.raises(SystemExit):  # 'same' without a template
        main(["tif-to-n5", "-i", "/tmp/none", "-o", "/tmp/o.n5", "--compression", "same"])
    capsys.readouterr()


def test_cli_blosc_import(spark, capsys):
    """--compression blosc (the reference CLI's last codec id,
    tif_to_n5.py:82) imports and reads back losslessly; typesize in the
    written chunks is refined to the element width by the codec layer."""
    import numpy as np

    from n5_dask_spark.cli import main
    from n5_dask_spark.sources.n5.reader import read_full

    tif_dir = tdir("tifs-blosc")
    assert main(["n5-to-tif", "-i", FIXTURE, "-d", FIXTURE_DS, "-o", tif_dir]) == 0
    capsys.readouterr()

    n5_out = os.path.join(tdir("n5-blosc"), "out.n5")
    assert (
        main(
            [
                "tif-to-n5", "-i", tif_dir, "-o", n5_out, "-d", "/mri/c0/s0",
                "-c", "64,64,64", "--compression", "blosc",
            ]
        )
        == 0
    )
    meta = json.loads(capsys.readouterr().out)["attributes"]
    assert meta["compression"]["type"] == "blosc"
    np.testing.assert_array_equal(read_full(spark, n5_out, "mri/c0/s0"), fixture_volume_xyz())


def test_tune_session_preserves_user_confs(spark):
    """--conf keys recorded on the session must survive tune_session's
    tuning defaults (determinism confs still always apply)."""
    from n5_dask_spark.session import tune_session

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark._n5ds_user_confs = frozenset({"spark.sql.shuffle.partitions"})
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        tune_session(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"  # determinism wins
    finally:
        spark._n5ds_user_confs = frozenset()
        spark.conf.set("spark.sql.shuffle.partitions", old)
        tune_session(spark)


def test_cli_malformed_conf_rejected():
    import argparse

    import pytest as _pytest

    from n5_dask_spark.cli import _spark

    ns = argparse.Namespace(conf=["spark.sql.shuffle.partitions"], cpus=2)
    with _pytest.raises(SystemExit, match="key=value"):
        _spark(ns)
