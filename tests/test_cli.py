"""Chained CLI: the reference's config -> search -> composite -> download
pipeline shape (cli.py:386-396) end-to-end."""

from __future__ import annotations

import pytest

from geedim_spark import cli
from geedim_spark.sources import snapshots


def test_cli_chain_splitting():
    glob, segs = cli._split_chain([
        "--synthetic", "30", "config", "--no-mask-shadows",
        "search", "--start", "2024-01-01", "download", "--out", "/tmp/x",
    ])
    assert glob == ["--synthetic", "30"]
    assert [s[0] for s in segs] == ["config", "search", "download"]


def test_cli_search_download(spark, tmp_path, capsys):
    out = str(tmp_path / "cli_table")
    rc = cli.main([
        "--synthetic", "40",
        "config", "--no-mask-cirrus",
        "search", "--start", "2024-01-01", "--end", "2025-06-01",
        "--synthetic-rois", "4", "--cloudless-portion", "50",
        "download", "--out", out, "--max-tile-dim", "21",
    ], spark=spark)
    assert rc == 0
    printed = capsys.readouterr().out
    assert "config: {'mask_cirrus': False}" in printed
    assert "search:" in printed and "download: snapshot" in printed
    assert snapshots.read_snapshot(spark, out).count() > 0


def test_cli_composite_download(spark, tmp_path):
    out = str(tmp_path / "cli_comp_table")
    rc = cli.main([
        "--synthetic", "30",
        "search", "--start", "2024-01-01", "--synthetic-rois", "3",
        "composite", "--method", "mosaic",
        "download", "--out", out, "--partition-col", "collection",
        "--max-tile-dim", "21",
    ], spark=spark)
    assert rc == 0
    back = snapshots.read_snapshot(spark, out)
    assert back.count() > 0


def test_cli_arg_errors(spark):
    with pytest.raises(SystemExit):
        cli.main(["config", "--mask-cirrus"], spark=spark)  # no input source
    with pytest.raises(SystemExit):
        cli.main(["--synthetic", "10"], spark=spark)        # no commands


def test_cli_chain_split_option_values_not_boundaries():
    """Regression: a command name appearing as an option VALUE (--rois
    config) must not start a new stage."""
    glob, segs = cli._split_chain([
        "--synthetic", "30",
        "search", "--rois", "config", "--start", "2024-01-01",
        "download", "--out", "download",
    ])
    assert [s[0] for s in segs] == ["search", "download"]
    assert segs[0] == ["search", "--rois", "config", "--start", "2024-01-01"]
    assert segs[1] == ["download", "--out", "download"]


def test_cli_search_show_table(spark, capsys):
    from geedim_spark import cli

    rc = cli.main([
        "--synthetic", "30", "search",
        "--start", "2024-01-01", "--end", "2025-01-01", "--show-table",
    ], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "images match" in out
    assert "ABBREV" in out and "INDEX" in out and "DATE" in out
