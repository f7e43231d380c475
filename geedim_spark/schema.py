"""Per-collection property schemas + abbreviations.

Re-expression of the reference's declared schema system
(/root/reference/geedim/schema.py:20-245 and collection.py:84-97,233-292):

- three property schemas (default / Landsat / Sentinel-2) mapping property
  names to (abbrev, description);
- the 19-collection registry: collection id -> gd name, property schema,
  mask family (the dispatch the mask engine keys on), and a description;
- :func:`abbreviate` — the camel/snake acronym rule used for properties
  outside the declared schema;
- :func:`schema_for` — runtime-extensible resolution
  (``schemaPropertyNames`` analog): callers pass any property-name list and
  get a full schema back, declared entries first-class and unknown names
  auto-abbreviated;
- :func:`schema_table` / :func:`properties_table` — printable forms
  (schemaTable / propertiesTable analogs, no third-party tabulate).
"""

from __future__ import annotations

DEFAULT_PROP_SCHEMA = {
    "system:index": {"abbrev": "INDEX", "description": "image index within its collection"},
    "system:time_start": {
        "abbrev": "DATE",
        "description": "capture timestamp (UTC)",
    },
    "FILL_PORTION": {
        "abbrev": "FILL",
        "description": "valid share of the region's pixels (%)",
    },
}

LANDSAT_PROP_SCHEMA = {
    **DEFAULT_PROP_SCHEMA,
    "CLOUDLESS_PORTION": {
        "abbrev": "CLOUDLESS",
        "description": "cloud-free share of the filled pixels (%)",
    },
    "GEOMETRIC_RMSE_MODEL": {
        "abbrev": "GRMSE",
        "description": "geometric model RMSE, metres",
    },
    "SUN_AZIMUTH": {"abbrev": "SAA", "description": "sun azimuth, degrees"},
    "SUN_ELEVATION": {"abbrev": "SEA", "description": "sun elevation, degrees"},
}

S2_PROP_SCHEMA = {
    **DEFAULT_PROP_SCHEMA,
    "CLOUDLESS_PORTION": {
        "abbrev": "CLOUDLESS",
        "description": "cloud-free share of the filled pixels (%)",
    },
    "RADIOMETRIC_QUALITY": {
        "abbrev": "RADQ",
        "description": "radiometric QC flag",
        "dtype": "string",  # QC flags hold 'PASSED'/'FAILED', not numbers
    },
    "GEOMETRIC_QUALITY": {"abbrev": "GEOMQ",
                          "description": "geometric QC flag",
                          "dtype": "string"},
    "MEAN_SOLAR_AZIMUTH_ANGLE": {
        "abbrev": "SAA",
        "description": "sun azimuth, degrees",
    },
    "MEAN_SOLAR_ZENITH_ANGLE": {
        "abbrev": "SZA",
        "description": "sun zenith, degrees",
    },
    "MEAN_INCIDENCE_AZIMUTH_ANGLE_B1": {
        "abbrev": "VAA",
        "description": "B1 view azimuth, degrees",
    },
    "MEAN_INCIDENCE_ZENITH_ANGLE_B1": {
        "abbrev": "VZA",
        "description": "B1 view zenith, degrees",
    },
}


def _landsat(num: str, level: str, family: str, descr: str) -> dict:
    return {
        "gd_coll_name": f"l{num}-c2-{level}",
        "prop_schema": LANDSAT_PROP_SCHEMA,
        "mask_family": family,
        "description": descr,
    }


def _s2(name: str, family: str, descr: str) -> dict:
    return {
        "gd_coll_name": name,
        "prop_schema": S2_PROP_SCHEMA,
        "mask_family": family,
        "description": descr,
    }


# collection id -> schema entry (schema.py:75-241; mask_family replaces the
# reference's image_type class: 'landsat-sr' / 'landsat-sr-aerosol' carry
# the SR aerosol-band distinction, 'landsat-toa-raw' the TOA/raw one,
# 's2-sr' vs 's2-toa' the CDI twin-image behavior)
COLLECTION_SCHEMA = {
    # Landsat surface reflectance
    "LANDSAT/LT04/C02/T1_L2": _landsat("4", "l2", "landsat-sr",
        "Landsat-4 C2 T1 L2 surface reflectance"),
    "LANDSAT/LT05/C02/T1_L2": _landsat("5", "l2", "landsat-sr",
        "Landsat-5 C2 T1 L2 surface reflectance"),
    "LANDSAT/LE07/C02/T1_L2": _landsat("7", "l2", "landsat-sr",
        "Landsat-7 C2 T1 L2 surface reflectance"),
    "LANDSAT/LC08/C02/T1_L2": _landsat("8", "l2", "landsat-sr-aerosol",
        "Landsat-8 C2 T1 L2 surface reflectance"),
    "LANDSAT/LC09/C02/T1_L2": _landsat("9", "l2", "landsat-sr-aerosol",
        "Landsat-9 C2 T1 L2 surface reflectance"),
    # Landsat TOA reflectance
    "LANDSAT/LT04/C02/T1_TOA": _landsat("4", "toa", "landsat-toa-raw",
        "Landsat-4 C2 T1 top-of-atmosphere reflectance"),
    "LANDSAT/LT05/C02/T1_TOA": _landsat("5", "toa", "landsat-toa-raw",
        "Landsat-5 C2 T1 top-of-atmosphere reflectance"),
    "LANDSAT/LE07/C02/T1_TOA": _landsat("7", "toa", "landsat-toa-raw",
        "Landsat-7 C2 T1 top-of-atmosphere reflectance"),
    "LANDSAT/LC08/C02/T1_TOA": _landsat("8", "toa", "landsat-toa-raw",
        "Landsat-8 C2 T1 top-of-atmosphere reflectance"),
    "LANDSAT/LC09/C02/T1_TOA": _landsat("9", "toa", "landsat-toa-raw",
        "Landsat-9 C2 T1 top-of-atmosphere reflectance"),
    # Landsat at-sensor radiance
    "LANDSAT/LT04/C02/T1": _landsat("4", "raw", "landsat-toa-raw",
        "Landsat-4 C2 T1 at-sensor radiance"),
    "LANDSAT/LT05/C02/T1": _landsat("5", "raw", "landsat-toa-raw",
        "Landsat-5 C2 T1 at-sensor radiance"),
    "LANDSAT/LE07/C02/T1": _landsat("7", "raw", "landsat-toa-raw",
        "Landsat-7 C2 T1 at-sensor radiance"),
    "LANDSAT/LC08/C02/T1": _landsat("8", "raw", "landsat-toa-raw",
        "Landsat-8 C2 T1 at-sensor radiance"),
    "LANDSAT/LC09/C02/T1": _landsat("9", "raw", "landsat-toa-raw",
        "Landsat-9 C2 T1 at-sensor radiance"),
    # Sentinel-2 surface reflectance
    "COPERNICUS/S2_SR": _s2(
        "s2-sr", "s2-sr", "Sentinel-2 L2A surface reflectance"),
    "COPERNICUS/S2_SR_HARMONIZED": _s2(
        "s2-sr-hm", "s2-sr",
        "Sentinel-2 L2A surface reflectance, harmonised"),
    # Sentinel-2 TOA reflectance
    "COPERNICUS/S2": _s2(
        "s2-toa", "s2-toa",
        "Sentinel-2 L1C top-of-atmosphere reflectance"),
    "COPERNICUS/S2_HARMONIZED": _s2(
        "s2-toa-hm", "s2-toa",
        "Sentinel-2 L1C top-of-atmosphere reflectance, harmonised"),
}

# geedim <-> Earth Engine collection name maps (schema.py:243-245)
EE_TO_GD = {k: v["gd_coll_name"] for k, v in COLLECTION_SCHEMA.items()}
GD_TO_EE = {v: k for k, v in EE_TO_GD.items()}


def abbreviate(name: str) -> str:
    """Acronym for a camel/snake-case property name (collection.py:84-97):
    keep digits, initials after '_', and lower->upper transitions; names of
    <= 5 chars (or acronyms shorter than 2) pass through unchanged."""
    name = name.strip()
    if len(name) <= 5:
        return name
    abbrev = ""
    prev = "_"
    for curr in name:
        if curr.isdigit():
            abbrev += curr
        elif (prev == "_" and curr.isalnum()) or (prev.islower() and curr.isupper()):
            abbrev += curr.upper()
        prev = curr
    return abbrev if len(abbrev) >= 2 else name


def mask_family(collection_id: str) -> str | None:
    """Declared mask family for a collection id, or None when unregistered
    (the _get_class_for_id dispatch, mask.py:536-544)."""
    entry = COLLECTION_SCHEMA.get(collection_id)
    return entry["mask_family"] if entry else None


def schema_for(
    collection_id: str | None,
    prop_names: list[str] | tuple[str, ...] | None = None,
) -> dict[str, dict]:
    """Property schema for a collection, optionally restricted/extended to
    ``prop_names`` (the ``schemaPropertyNames`` behavior, collection.py:
    233-292): declared properties keep their abbrev/description; unknown
    names get an auto-abbreviation and no description.  Duplicate names are
    collapsed keeping first occurrence."""
    entry = COLLECTION_SCHEMA.get(collection_id or "")
    base = entry["prop_schema"] if entry else DEFAULT_PROP_SCHEMA
    if prop_names is None:
        return dict(base)
    if not all(isinstance(n, str) for n in prop_names):
        raise ValueError("prop_names should be an iterable of strings")
    out = {}
    for name in dict.fromkeys(prop_names):
        out[name] = base.get(
            name, {"abbrev": abbreviate(name), "description": None}
        )
    return out


def abbrev_map(collection_id: str | None) -> dict[str, str]:
    """abbrev -> property name for the collection's declared schema (used
    by search() to accept schema abbreviations in filter expressions)."""
    return {
        v["abbrev"]: k for k, v in schema_for(collection_id).items()
    }


def schema_table(schema: dict[str, dict]) -> str:
    """Plain-text table of (ABBREV, NAME, DESCRIPTION) — schemaTable analog
    (collection.py:294-312) without the tabulate dependency."""
    if not schema:
        return ""
    rows = [
        (pd["abbrev"], pn, str(pd["description"] or "-"))
        for pn, pd in schema.items()
    ]
    headers = ("ABBREV", "NAME", "DESCRIPTION")
    widths = [
        max(len(headers[c]), *(len(r[c]) for r in rows)) for c in range(3)
    ]
    def fmt(r):
        return "  ".join(str(v).ljust(w) for v, w in zip(r, widths)).rstrip()
    lines = [fmt(headers), fmt(tuple("-" * w for w in widths))]
    lines += [fmt(r) for r in rows]
    return "\n".join(lines)


def properties_table(
    properties: dict[str, dict], schema: dict[str, dict]
) -> str:
    """Schema-defined subset of per-image properties with abbreviated
    column headers (propertiesTable analog, collection.py:330-360)."""
    if not properties or not schema:
        return ""
    headers = tuple(pd["abbrev"] for pd in schema.values())
    names = list(schema.keys())
    rows = []
    for props in properties.values():
        rows.append(tuple(
            "-" if props.get(n) is None else str(props.get(n)) for n in names
        ))
    widths = [
        max(len(headers[c]), *(len(r[c]) for r in rows))
        for c in range(len(headers))
    ]
    def fmt(r):
        return "  ".join(str(v).ljust(w) for v, w in zip(r, widths)).rstrip()
    lines = [fmt(headers), fmt(tuple("-" * w for w in widths))]
    lines += [fmt(r) for r in rows]
    return "\n".join(lines)
