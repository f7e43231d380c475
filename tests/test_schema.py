"""Declared per-collection schema system — ports of the reference's
test_collection.py:195-290 schema/abbreviation shapes."""

from __future__ import annotations

import pytest

from geedim_spark import schema


def test_registry_covers_reference_collections():
    """All 19 declared ids (schema.py:75-241): 15 Landsat x 3 levels + 4 S2."""
    assert len(schema.COLLECTION_SCHEMA) == 19
    assert sum(1 for k in schema.COLLECTION_SCHEMA if k.startswith("LANDSAT/")) == 15
    assert sum(1 for k in schema.COLLECTION_SCHEMA if k.startswith("COPERNICUS/")) == 4
    # gd <-> ee name maps are bijective
    assert len(schema.EE_TO_GD) == len(schema.GD_TO_EE) == 19
    assert schema.GD_TO_EE["s2-sr-hm"] == "COPERNICUS/S2_SR_HARMONIZED"
    assert schema.EE_TO_GD["LANDSAT/LC09/C02/T1_L2"] == "l9-c2-l2"


def test_mask_family_dispatch():
    assert schema.mask_family("LANDSAT/LC08/C02/T1_L2") == "landsat-sr-aerosol"
    assert schema.mask_family("LANDSAT/LT05/C02/T1_L2") == "landsat-sr"
    assert schema.mask_family("LANDSAT/LC08/C02/T1_TOA") == "landsat-toa-raw"
    assert schema.mask_family("COPERNICUS/S2_SR_HARMONIZED") == "s2-sr"
    assert schema.mask_family("COPERNICUS/S2_HARMONIZED") == "s2-toa"
    assert schema.mask_family("MODIS/061/MCD43A4") is None


@pytest.mark.parametrize("coll_id", [
    "COPERNICUS/S2_SR_HARMONIZED", "LANDSAT/LC09/C02/T1_L2", None,
])
def test_schema_defaults(coll_id):
    """Default schema == the collection's declared prop schema
    (test_collection.py:195-213 port)."""
    want = (
        schema.COLLECTION_SCHEMA[coll_id]["prop_schema"]
        if coll_id in schema.COLLECTION_SCHEMA
        else schema.DEFAULT_PROP_SCHEMA
    )
    assert schema.schema_for(coll_id) == want


def test_schema_property_names_set():
    """Runtime extension: declared names keep abbrev+description, unknown
    names auto-abbreviate with no description; duplicates collapse
    (test_collection.py:216-245 port)."""
    names = (
        "CLOUDLESS_PORTION", "CLOUD_COVERAGE_ASSESSMENT", "unknownPropertyName",
        "CLOUDLESS_PORTION", "CLOUD_COVERAGE_ASSESSMENT",  # dups
    )
    got = schema.schema_for("COPERNICUS/S2_SR_HARMONIZED", names)
    assert tuple(got.keys()) == names[:3]
    for prop, abbrev, has_descr in zip(
        names[:3], ["CLOUDLESS", "CCA", "UPN"], [True, False, False]
    ):
        assert got[prop]["abbrev"] == abbrev
        if has_descr:
            assert got[prop]["description"]
        else:
            assert got[prop]["description"] is None
    with pytest.raises(ValueError, match="iterable of strings"):
        schema.schema_for(None, [123])


def test_abbreviate_rule():
    """collection.py:84-97 acronym semantics."""
    assert schema.abbreviate("CLOUD_COVERAGE_ASSESSMENT") == "CCA"
    assert schema.abbreviate("unknownPropertyName") == "UPN"
    assert schema.abbreviate("MEAN_SOLAR_AZIMUTH_ANGLE") == "MSAA"
    assert schema.abbreviate("short") == "short"          # <= 5 chars pass through
    assert schema.abbreviate("B1") == "B1"
    assert schema.abbreviate("lowercase") == "lowercase"  # acronym < 2 chars


def test_schema_table_format():
    """schemaTable shape (test_collection.py:260-272 port): header + rule +
    one line per property; every name present; empty schema -> ''."""
    sch = schema.schema_for(
        "COPERNICUS/S2_SR_HARMONIZED",
        tuple(schema.S2_PROP_SCHEMA) + ("unknownPropertyName",),
    )
    table = schema.schema_table(sch)
    assert len(table.splitlines()) == len(sch) + 2
    assert all(pn in table for pn in sch)
    assert schema.schema_table({}) == ""


def test_properties_table():
    """propertiesTable: abbreviated headers, '-' for missing values
    (test_collection.py:275-290 port)."""
    props = {
        "1": {"system:index": "1", "system:time_start": 0, "propName": "v"},
        "2": {"system:index": "2", "system:time_start": 1, "propName": None},
        "3": {"system:index": "3", "otherPropName": "x"},
    }
    sch = schema.schema_for(None, ("system:index", "system:time_start", "propName"))
    table = schema.properties_table(props, sch)
    lines = table.splitlines()
    assert len(lines) == 2 + 3
    assert lines[0].split() == ["INDEX", "DATE", "PN"]
    assert "-" in lines[3] and "-" in lines[4]  # missing values render '-'
    assert schema.properties_table({}, sch) == ""


def test_search_accepts_schema_abbreviations(spark):
    """search() custom_filter written in schema abbreviations resolves to
    engine columns (props map / portion columns / time_start)."""
    from geedim_spark import synth
    from geedim_spark.operators import collection_ops as co

    expr = co.expand_schema_filter(
        "SAA <= 180 and CLOUDLESS >= 60 and DATE >= timestamp'2024-01-01'",
        "COPERNICUS/S2_SR_HARMONIZED",
    )
    assert "cast(props['MEAN_SOLAR_AZIMUTH_ANGLE'] as double)" in expr
    assert "CLOUDLESS_PORTION" in expr and "time_start" in expr

    imgs = synth.images_df(spark, 60, scalar_filter="fmt = 'raw' AND i % 3 = 2")
    rois = synth.rois_df(spark, 30)
    got = co.search(
        imgs, rois=rois, custom_filter="SAA <= 180",
        collection_id="COPERNICUS/S2_SR_HARMONIZED",
    ).select("image_id").collect()
    want = co.search(
        imgs, rois=rois,
        custom_filter="cast(props['MEAN_SOLAR_AZIMUTH_ANGLE'] as double) <= 180",
    ).select("image_id").collect()
    assert sorted(got) == sorted(want) and len(got) > 0


def test_expand_schema_filter_skips_string_literals():
    from geedim_spark.operators import collection_ops as co

    out = co.expand_schema_filter(
        "caption LIKE '%DATE%' AND DATE >= timestamp'2024-01-01'",
        "COPERNICUS/S2_SR_HARMONIZED",
    )
    assert "'%DATE%'" in out                       # literal untouched
    assert "time_start >= timestamp'2024-01-01'" in out


def test_api_search_accepts_abbreviations(spark):
    from geedim_spark.api import Collection
    from geedim_spark import synth

    from pyspark.errors.exceptions.captured import AnalysisException

    coll = Collection(
        synth.images_meta_df(spark, 30).filter("collection = 'MOCK/CONST'")
    )
    # MOCK is not in the registry -> default schema has no SAA -> the token
    # passes through and fails analysis loudly; a registered id expands it
    with pytest.raises(AnalysisException, match="SAA"):
        coll.search(custom_filter="SAA <= 180")
    coll2 = Collection(
        synth.images_meta_df(spark, 30)
        .filter("collection = 'COPERNICUS/S2_SR_HARMONIZED'")
    )
    rows = coll2.search(custom_filter="SAA <= 180").df.collect()
    assert all(
        int(r["props"]["MEAN_SOLAR_AZIMUTH_ANGLE"]) <= 180 for r in rows
    ) and rows


def test_expand_schema_filter_preserves_sql_date_keyword():
    """DATE in SQL *type* position must survive: the ANSI literal prefix
    (DATE '2024-01-01') and CAST(x AS DATE).  Abbreviation positions are
    still rewritten in the same expression."""
    from geedim_spark.operators import collection_ops as co

    out = co.expand_schema_filter(
        "DATE >= DATE '2024-01-01' AND CAST(x AS DATE) = DATE '2024-02-03'",
        "COPERNICUS/S2_SR_HARMONIZED",
    )
    assert out == (
        "time_start >= DATE '2024-01-01' "
        "AND CAST(x AS DATE) = DATE '2024-02-03'"
    )

    # lowercase 'as' variant; abbreviation still expands elsewhere
    out = co.expand_schema_filter(
        "cast(t as DATE) < DATE '2025-01-01' or DATE > timestamp'2024-06-01'",
        "COPERNICUS/S2_SR_HARMONIZED",
    )
    assert "cast(t as DATE)" in out
    assert "DATE '2025-01-01'" in out
    assert "time_start > timestamp'2024-06-01'" in out
