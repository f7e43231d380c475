"""Chained pipeline API — CLI-flow parity (config -> search -> composite ->
download, cli.py:386-396)."""

from __future__ import annotations

import numpy as np
import pytest

from geedim_spark import codecs, synth
from geedim_spark.api import Collection
from geedim_spark.sources import snapshots


def test_chained_search_composite_download(spark, tmp_path):
    rois = synth.rois_df(spark, 4)
    coll = (
        Collection.from_synthetic(spark, 60, scalar_filter="fmt = 'raw'")
        .config(mask_cirrus=False)
        .search(start="2024-01-01", end="2025-01-01", rois=rois)
    )
    assert coll.cloud_kwargs == {"mask_cirrus": False}
    n_found = coll.count()
    assert 0 < n_found <= 45

    comp = coll.composite("mosaic")
    row = comp.df.first()
    assert row["n_inputs"] == n_found
    px = codecs.decode(bytes(row["bytes"]))
    assert px.shape[0] == 2

    meta = coll.composite_metadata("mosaic").first()
    assert meta["system_index"] == "MOSAIC-COMP"


def test_download_with_resume(spark, tmp_path):
    table = str(tmp_path / "dl_table")
    coll = Collection.from_synthetic(spark, 24, scalar_filter="fmt = 'raw'")
    sid1 = coll.download(table, max_tile_dim=21, max_tile_bands=1)
    n1 = snapshots.read_snapshot(spark, table).count()
    assert n1 == coll.count() * 8
    # resume: everything committed -> second call commits nothing new
    sid2 = coll.download(table, max_tile_dim=21, max_tile_bands=1)
    assert snapshots.read_snapshot(spark, table).count() == n1
    assert sid2 != sid1


def test_from_images_compatibility(spark):
    a = Collection.from_synthetic(spark, 30).df.filter("collection = 'MOCK/CONST'")
    b = Collection.from_synthetic(spark, 60).df.filter("collection = 'MOCK/CONST'")
    u = Collection.from_images(Collection(a), Collection(b))
    assert u.count() == a.count() + b.count()
    mixed = Collection(Collection.from_synthetic(spark, 30).df)
    with pytest.raises(ValueError, match="Incompatible"):
        Collection.from_images(mixed)
