"""CLI entry smoke (reference O23: the Luigi task invocation surface)."""

from __future__ import annotations

import os
import shutil

from gjenbruksstasjoner_kotid_estimering_spark.__main__ import main

REF_JPG = "/root/reference/test/data/station_id_41_20200506T094000.jpg"


def test_cli_list(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "queue_estimate\toracle" in out


def test_cli_query(capsys):
    assert main(["--query", "scan_limit1", "--show", "1"]) == 0
    assert "scan_limit1: 1 rows" in capsys.readouterr().out


def test_cli_unknown_query():
    assert main(["--query", "nope"]) == 2


def test_cli_images_path_prefix(tmp_path, capsys):
    """--images + --path-prefix is the Luigi --prefix= analog: only frames
    under the prefix are processed (tasks.py:14,44-45)."""
    import pytest

    if not os.path.exists(REF_JPG):
        pytest.skip("reference fixture not present")
    d = tmp_path / "frames"
    d.mkdir()
    shutil.copy(REF_JPG, d / os.path.basename(REF_JPG))
    shutil.copy(REF_JPG, d / "station_id_7_20200506T094000.jpg")
    out_dir = str(tmp_path / "features")
    rc = main(
        [
            "--images", str(d),
            "--path-prefix", "station_id_41",
            "--out", out_dir,
            "--show", "2",
        ]
    )
    assert rc == 0
    text = capsys.readouterr().out
    assert "1 frames" in text  # prefix filtered 2 -> 1
    from gjenbruksstasjoner_kotid_estimering_spark.session import get_spark

    feats = get_spark().read.parquet(out_dir)
    assert feats.count() == 1
    assert feats.collect()[0].station_id == 41
