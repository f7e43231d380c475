"""Chained CLI — the reference's click pipeline as a Spark entrypoint.

geedim's CLI is a chained group (cli.py:386-396): ``geedim config ...
search ... composite ... download ...`` where each stage reads/extends a
shared context.  This module reproduces that shape without click (argparse
only, per the environment constraints): argv is split on the known command
names and each segment is parsed by its own sub-parser, threading a
:class:`geedim_spark.api.Collection` through the stages.

    python -m geedim_spark --input /data/images.parquet \\
        config --no-mask-shadows \\
        search --start 2024-01-01 --end 2025-01-01 --cloudless-portion 60 \\
        composite --method q-mosaic \\
        download --out /tmp/export_table

``--synthetic N`` replaces ``--input`` for a self-contained demo run.
Each stage prints a one-line summary (the reference's tqdm/status analog).
"""

from __future__ import annotations

import argparse
import os
import sys

COMMANDS = ("config", "search", "composite", "download", "export")


# option names that consume the NEXT token as a value — a command name in
# that position is the option's value, not a stage boundary
_VALUE_OPTS = {
    "--input", "--synthetic", "--master",
    "--start", "--end", "--custom-filter", "--fill-portion",
    "--cloudless-portion", "--rois", "--synthetic-rois",
    "--buffer", "--add-props", "--results-file",
    "--method", "--date",
    "--region",
    "--out", "--partition-col", "--max-tile-dim", "--max-tile-bands",
    "--dtype", "--files-dir", "--overview-min-dim", "--bbox", "--id",
    "--split", "--band-name", "--compact-files",
    # r5 value-taking options: a command name in the value position must
    # not start a new stage (e.g. `--folder export` names a directory)
    "--mask-method", "--prob", "--score", "--cs-band", "--cdi-thresh",
    "--dark", "--shadow-dist", "--max-cloud-dist",
    "--crs", "--scale", "--crs-transform", "--shape", "--like",
    "--resampling", "--nodata", "--max-tile-size",
    "--type", "--folder", "--driver",
}


def _split_chain(argv: list[str]) -> tuple[list[str], list[list[str]]]:
    """Split argv into (global args, [per-command segments]).

    A token equal to a command name starts a new segment UNLESS it follows
    a value-taking option (e.g. ``--rois config`` names a path, not the
    config stage)."""
    segments, current = [], []
    globals_done = False
    glob: list[str] = []
    prev = None
    for tok in argv:
        boundary = tok in COMMANDS and prev not in _VALUE_OPTS
        prev = tok
        if boundary:
            if globals_done:
                segments.append(current)
            globals_done = True
            current = [tok]
        elif globals_done:
            current.append(tok)
        else:
            glob.append(tok)
    if globals_done:
        segments.append(current)
    return glob, segments


def _parsers() -> dict[str, argparse.ArgumentParser]:
    config = argparse.ArgumentParser(prog="config", add_help=False)
    config.add_argument("--mask-shadows", dest="mask_shadows",
                        action="store_true", default=None)
    config.add_argument("--no-mask-shadows", dest="mask_shadows",
                        action="store_false", default=None)
    config.add_argument("--mask-cirrus", dest="mask_cirrus",
                        action="store_true", default=None)
    config.add_argument("--no-mask-cirrus", dest="mask_cirrus",
                        action="store_false", default=None)
    config.add_argument("--mask-aerosols", dest="mask_aerosols",
                        action="store_true", default=None)
    config.add_argument("--mask-nonphysical", dest="mask_nonphysical",
                        action="store_true", default=None)
    # S2 method + threshold parameterisation (reference cli.py:523-537
    # option defs -> mask.py:264-534 kwargs; the operator layer accepts
    # every knob — masks.s2_masks / s2_score_mask_stats / cdi_mask_stats
    # / pipeline.mask_and_tile — this is pure plumbing)
    config.add_argument("--mask-method", dest="mask_method", default=None,
                        choices=("cloud-score", "cloud-prob", "qa"),
                        help="S2 cloud mask method (reference -mm/"
                             "--mask-method)")
    config.add_argument("--prob", dest="prob_thresh", type=float,
                        default=None,
                        help="cloud-prob threshold %% (reference -p/--prob)")
    config.add_argument("--score", dest="score_thresh", type=float,
                        default=None,
                        help="Cloud Score+ threshold (reference -s/--score)")
    config.add_argument("--cs-band", dest="cs_band", default=None,
                        choices=("cs", "cs_cdf"),
                        help="Cloud Score+ band to threshold (reference "
                             "-cb/--cs-band)")
    config.add_argument("--cdi-thresh", dest="cdi_thresh", type=float,
                        default=None,
                        help="Cloud Displacement Index threshold "
                             "(reference -cdi/--cdi-thresh; None = unused)")
    config.add_argument("--dark", dest="dark", type=float, default=None,
                        help="NIR reflectance threshold for shadow "
                             "candidates (reference -d/--dark)")
    config.add_argument("--shadow-dist", dest="shadow_dist", type=float,
                        default=None,
                        help="max distance (m) to project cloud shadows "
                             "(reference -sd/--shadow-dist)")
    config.add_argument("--max-cloud-dist", dest="max_cloud_dist",
                        type=float, default=None,
                        help="max distance (m) for the CLOUD_DIST band "
                             "(reference -mcd/--max-cloud-dist)")

    search = argparse.ArgumentParser(prog="search", add_help=False)
    search.add_argument("--start")
    search.add_argument("--end")
    search.add_argument("--custom-filter")
    search.add_argument("--fill-portion", type=float)
    search.add_argument("--cloudless-portion", type=float)
    search.add_argument("--rois", help="parquet path of the ROI table")
    search.add_argument("--region", default=None,
                        help="path of a GeoJSON file defining the region "
                             "bounds (the reference CLI's -r/--region, "
                             "cli.py:257-268); Polygon / Feature / "
                             "FeatureCollection")
    search.add_argument("--bbox", type=float, nargs=4, default=None,
                        metavar=("LEFT", "BOTTOM", "RIGHT", "TOP"),
                        help="region bounds as coordinates (the reference "
                             "CLI's -b/--bbox, cli.py:245-256)")
    search.add_argument("--buffer", type=float, default=None,
                        help="distance (world units) to buffer the ROI "
                             "bboxes with (cli.py:269-275, 644-645)")
    search.add_argument("--add-props", default=None,
                        help="comma-separated extra property names for the "
                             "results table / file (cli.py:598-606)")
    search.add_argument("--results-file", default=None,
                        help="path to write JSON search results to "
                             "(cli.py:608-613, 673-676)")
    search.add_argument("--synthetic-rois", type=int, default=None,
                        help="generate M synthetic ROIs instead of --rois")
    search.add_argument("--show-table", action="store_true",
                        help="print the schema + abbreviated properties "
                             "tables for the results (the reference CLI's "
                             "search display, cli.py results table)")

    composite = argparse.ArgumentParser(prog="composite", add_help=False)
    composite.add_argument("--method", default="q-mosaic")
    composite.add_argument("--date")
    composite.add_argument("--by-portion", action="store_true")

    download = argparse.ArgumentParser(prog="download", add_help=False)
    download.add_argument("--out", required=True)
    download.add_argument("--dtype", default=None,
                          help="saturating export dtype cast "
                               "(image.py:571-596)")
    download.add_argument("--no-mask", dest="apply_mask",
                          action="store_false", default=True,
                          help="export unmasked pixels (the reference's "
                               "mask=False, cli.py download)")
    download.add_argument("--partition-col", default="collection")
    download.add_argument("--no-resume", action="store_true")
    download.add_argument("--max-tile-dim", type=int, default=10000)
    download.add_argument("--max-tile-bands", type=int, default=1024)
    download.add_argument("--files-dir", default=None,
                          help="also write one GeoTIFF per image here "
                               "(the reference CLI's user deliverable, "
                               "cli.py download -dd; tiles are assembled "
                               "executor-side via write_image_files)")
    download.add_argument("--overviews", action="store_true",
                          help="write overview (reduced-resolution) pages "
                               "into the GeoTIFFs (image.py:1060-1077)")
    download.add_argument("--driver", choices=("gtiff", "cog"),
                          default="gtiff",
                          help="GeoTIFF byte layout (reference -dv/"
                               "--driver, enums.py Driver): cog places "
                               "IFDs + overviews at the file front for "
                               "range-request readers and implies "
                               "--overviews")
    download.add_argument("--scale-offset", action="store_true",
                          help="apply the catalog's STAC band scale/"
                               "offset to the exported pixels (the "
                               "reference CLI's -so/--scale-offset, "
                               "cli.py:319-326; applied after masks, "
                               "before --dtype)")
    download.add_argument("--band-name", dest="bands", action="append",
                          default=None,
                          help="export only these band name(s); repeatable "
                               "(the reference CLI's -bn/--band-name, "
                               "cli.py:364-372).  Masks are computed from "
                               "the full band set first, then the "
                               "selection applies")
    download.add_argument("--id", dest="image_ids", action="append",
                          default=None,
                          help="export only these image id(s); repeatable "
                               "(the reference CLI's -i/--id, "
                               "cli.py:356-362)")
    download.add_argument("--split", choices=("images", "bands"),
                          default="images",
                          help="one GeoTIFF per image, or one per band of "
                               "each image (the reference CLI's "
                               "-sp/--split, cli.py:374-383); applies to "
                               "--files-dir")
    download.add_argument("--crs", default=None,
                          help="export CRS (reference -c/--crs); grid "
                               "args route through operators/reproject "
                               "after the masks are applied")
    download.add_argument("--scale", type=float, default=None,
                          help="export pixel scale (reference -s/--scale"
                               "); reprojects onto the scaled grid")
    download.add_argument("--crs-transform", type=float, nargs=6,
                          default=None,
                          metavar=("XSCALE", "XSHEAR", "XTRANS",
                                   "YSHEAR", "YSCALE", "YTRANS"),
                          help="explicit export affine transform "
                               "(reference -ct/--crs-transform); needs "
                               "--shape")
    download.add_argument("--shape", type=int, nargs=2, default=None,
                          metavar=("HEIGHT", "WIDTH"),
                          help="export dimensions in pixels (reference "
                               "-sh/--shape)")
    download.add_argument("--like", default=None,
                          help="parquet path of a georeferenced image "
                               "table whose first row defines --crs, "
                               "--crs-transform & --shape (reference "
                               "-l/--like, cli.py:349-354)")
    download.add_argument("--resampling", default="near",
                          choices=("near", "bilinear", "bicubic"),
                          help="resampling for reprojection (reference "
                               "-rs/--resampling)")
    download.add_argument("--nodata", type=float, default=None,
                          help="override the GeoTIFF nodata tag written "
                               "by --files-dir (reference profile "
                               "nodata, image.py)")
    download.add_argument("--max-tile-size", type=float, default=4.0,
                          help="max export tile size in MB "
                               "(pipeline.mask_and_tile; reference "
                               "tile.py:111 max_tile_size)")
    download.add_argument("--compact-files", type=int, default=None,
                          metavar="MIN_FILES",
                          help="after the commit, rewrite partitions "
                               "spanning >= MIN_FILES parquet files to "
                               "one file each (snapshots."
                               "compact_partitions, Iceberg "
                               "rewrite_data_files analog)")
    download.add_argument("--overview-min-dim", type=int, default=256,
                          help="stop adding overview levels once both dims "
                               "drop under this (rasterio build_overviews "
                               "analog)")

    export = argparse.ArgumentParser(prog="export", add_help=False)
    export.add_argument("--type", choices=("drive", "asset", "cloud"),
                        default="drive",
                        help="export destination type (reference -t/--type,"
                             " cli.py:833-905); all types land as snapshot "
                             "tables here — the type picks the default "
                             "namespace and the folder requirement")
    export.add_argument("--folder", default=None,
                        help="destination folder/bucket/project (reference "
                             "-f/--folder; REQUIRED for asset/cloud)")
    export.add_argument("--id", dest="image_ids", action="append",
                        default=None)
    export.add_argument("--no-mask", dest="apply_mask",
                        action="store_false", default=True)
    export.add_argument("--dtype", default=None)
    export.add_argument("--scale-offset", action="store_true")
    export.add_argument("--band-name", dest="bands", action="append",
                        default=None)
    export.add_argument("--max-tile-dim", type=int, default=10000)
    export.add_argument("--no-wait", dest="wait", action="store_false",
                        default=True,
                        help="start the export task and return immediately "
                             "(reference -nw/--no-wait); the task handle "
                             "is printed and joined at CLI exit")
    return {"config": config, "search": search,
            "composite": composite, "download": download,
            "export": export}


def main(argv: list[str] | None = None, spark=None) -> int:
    from geedim_spark import synth
    from geedim_spark.api import Collection
    from geedim_spark.session import get_session

    glob_parser = argparse.ArgumentParser(prog="geedim_spark")
    glob_parser.add_argument("--input", help="images parquet path")
    glob_parser.add_argument("--synthetic", type=int, default=None,
                             help="use N synthetic images instead of --input")
    glob_parser.add_argument("--master", default=None)

    glob_args_raw, segments = _split_chain(
        list(sys.argv[1:] if argv is None else argv)
    )
    gargs = glob_parser.parse_args(glob_args_raw)
    if not segments:
        glob_parser.error(f"no commands given (chain any of {COMMANDS})")
    if (gargs.input is None) == (gargs.synthetic is None):
        glob_parser.error("exactly one of --input / --synthetic is required")

    spark = spark or get_session("geedim_spark_cli", master=gargs.master)
    if gargs.synthetic is not None:
        coll = Collection.from_synthetic(spark, gargs.synthetic,
                                         scalar_filter="fmt = 'raw'")
    else:
        coll = Collection.from_parquet(spark, gargs.input)

    parsers = _parsers()
    _pending_tasks: list = []
    for seg in segments:
        cmd, rest = seg[0], seg[1:]
        args = parsers[cmd].parse_args(rest)
        if cmd == "config":
            kwargs = {k: v for k, v in vars(args).items() if v is not None}
            coll = coll.config(**kwargs)
            print(f"config: {coll.cloud_kwargs}")
        elif cmd == "search":
            rois = None
            if args.synthetic_rois is not None:
                rois = synth.rois_df(spark, args.synthetic_rois)
            elif args.rois:
                rois = spark.read.parquet(args.rois)
            if args.bbox is not None or args.region is not None:
                if rois is not None or (
                    args.bbox is not None and args.region is not None
                ):
                    parsers[cmd].error(
                        "--bbox / --region are mutually exclusive with "
                        "each other and with --rois / --synthetic-rois"
                    )
                if args.bbox is not None:
                    x0, y0, x1, y1 = args.bbox
                    rid = "BBOX/0000"
                else:
                    from geedim_spark.cli_helpers import geojson_bounds
                    x0, y0, x1, y1 = geojson_bounds(args.region)
                    rid = "REGION/0000"
                rois = spark.createDataFrame(
                    [(rid, float(x0), float(y0), float(x1), float(y1))],
                    "roi_id string, rx0 double, ry0 double, "
                    "rx1 double, ry1 double",
                )
            if args.buffer is not None:
                if rois is None:
                    # cli.py:224-230: --buffer needs a region to buffer
                    parsers[cmd].error(
                        "--rois / --synthetic-rois / --bbox / --region is "
                        "required with --buffer"
                    )
                from pyspark.sql import functions as F
                b = float(args.buffer)
                rois = rois.withColumn("rx0", F.col("rx0") - b)                            .withColumn("ry0", F.col("ry0") - b)                            .withColumn("rx1", F.col("rx1") + b)                            .withColumn("ry1", F.col("ry1") + b)
            coll = coll.search(
                start=args.start, end=args.end, rois=rois,
                custom_filter=args.custom_filter,
                fill_portion=args.fill_portion,
                cloudless_portion=args.cloudless_portion,
            )
            n_found = coll.count()
            print(f"search: {n_found} images match")
            add_props = (
                [p.strip() for p in args.add_props.split(",") if p.strip()]
                if args.add_props else None
            )
            if args.show_table or add_props:
                # schemaPropertyNames += add_props (cli.py:656): EXTEND the
                # declared set, don't replace it
                names = (
                    list(coll.schema().keys()) + add_props if add_props
                    else None
                )
                print(coll.schema_table(prop_names=names))
                print(coll.properties_table(prop_names=names))
            if args.results_file:
                import json as _json
                # ALL found images (the reference writes the full result
                # set, cli.py:673-676) — the default n=20 is a table
                # preview cap, not a results cap
                with open(args.results_file, "w") as f:
                    _json.dump(coll.properties(n=n_found), f, default=str)
                print(f"search: results written to {args.results_file}")
        elif cmd == "composite":
            coll = coll.composite(args.method, date=args.date,
                                  by_portion=args.by_portion)
            print(f"composite: {args.method}")
        elif cmd == "download":
            if args.image_ids:
                from pyspark.sql import functions as F

                from geedim_spark.api import Collection as _Coll
                coll = _Coll(
                    coll.df.filter(F.col("image_id").isin(args.image_ids)),
                    coll.cloud_kwargs,
                )
            # dtype is applied INSIDE the export kernel AFTER masks are
            # computed (the reference's addMaskBands -> maskClouds ->
            # prepareForExport order) — casting the table first would
            # saturate the QA bands and garble every cloud bit
            band_kw = {}
            if args.bands:
                import re as _re
                band_kw["band_regex"] = "|".join(
                    _re.escape(b) for b in args.bands
                )
            grid_given = any(
                v is not None for v in (args.crs, args.scale,
                                        args.crs_transform, args.shape,
                                        args.like)
            )
            mask_kw = dict(apply_cloud_mask=args.apply_mask,
                           export_dtype=args.dtype,
                           scale_offset=args.scale_offset)
            if grid_given:
                # reference order (image.py:741-862): addMaskBands ->
                # maskClouds -> prepareForExport(spatial).  Masks are
                # applied FIRST (interpolating already-cast/garbled QA
                # bands is the bug the ordering rule prevents), then the
                # collection is reprojected onto the export grid, and the
                # tiler runs without re-masking/re-casting.
                if args.scale_offset:
                    parsers["download"].error(
                        "--scale-offset is not supported together with "
                        "the --crs/--scale/--crs-transform/--shape/--like "
                        "grid arguments"
                    )
                from geedim_spark.api import Collection as _Coll2
                from geedim_spark.api import Image as _Img

                like_row = None
                if args.like is not None:
                    like_row = spark.read.parquet(args.like).select(
                        "crs", "transform", "h", "w").first()
                work_df = coll.df
                if args.apply_mask:
                    work_df = _Img(coll.df, coll.cloud_kwargs) \
                        .mask_clouds().df
                coll = _Coll2(work_df, coll.cloud_kwargs).prepare_for_export(
                    dtype=args.dtype,
                    crs=args.crs,
                    crs_transform=(tuple(args.crs_transform)
                                   if args.crs_transform else None),
                    shape=tuple(args.shape) if args.shape else None,
                    scale=args.scale,
                    like=like_row,
                    resampling=args.resampling,
                )
                mask_kw = dict(apply_cloud_mask=False, export_dtype=None,
                               scale_offset=False)
            snap = coll.download(
                args.out, partition_col=args.partition_col,
                resume=not args.no_resume,
                max_tile_dim=args.max_tile_dim,
                max_tile_bands=args.max_tile_bands,
                max_tile_size=args.max_tile_size,
                **mask_kw,
                **band_kw,
            )
            print(f"download: snapshot {snap} -> {args.out}")
            if args.compact_files is not None:
                from geedim_spark.sources import snapshots as _snaps
                cid = _snaps.compact_partitions(
                    spark, args.out, min_files=args.compact_files
                )
                print(f"download: compacted -> snapshot {cid}")
            if args.files_dir:
                # the reference CLI's on-disk deliverable: one GeoTIFF per
                # image (cli.py download -dd -> image.py:954-1085), here
                # assembled executor-side from the committed tile snapshot
                from pyspark.sql import functions as F

                from geedim_spark import codecs as _codecs
                from geedim_spark.sources import sinks
                from geedim_spark.sources import snapshots as _snaps

                cur = _snaps.current_snapshot(args.out)
                if cur is None or not cur["partitions"]:
                    # empty export (every --id missed / empty search):
                    # clean no-op instead of an empty-snapshot error
                    print(f"download: 0 GeoTIFFs -> {args.files_dir}")
                    continue
                tiles = _snaps.read_snapshot(spark, args.out)
                geo_cols = [c for c in ("transform", "crs")
                            if c in coll.df.columns]
                tiles = tiles.join(
                    F.broadcast(coll.df.select("image_id", *geo_cols)),
                    "image_id",
                )
                # bounded driver pulls: one (w, h) grid (export guard), the
                # band count, and one tile header for the exported dtype
                dims = coll.df.agg(F.max("w").alias("w"),
                                   F.max("h").alias("h")).first()
                probe_row = tiles.select("tile_bytes").first()
                if probe_row is None or dims["h"] is None:
                    # empty export (every --id missed / empty search):
                    # clean no-op instead of TypeError on bytes(None);
                    # chained commands after this one still run
                    print(f"download: 0 GeoTIFFs -> {args.files_dir}")
                    continue
                nbands = int(tiles.agg(F.max("band_stop")).first()[0])
                probe = _codecs.decode(bytes(probe_row["tile_bytes"]))
                dtype = probe.dtype.name
                band_names = None
                if args.split == "bands":
                    # the reference raises on inconsistent band sets
                    # before splitting (collection.py:467-468
                    # _raise_image_consistency); band names come from the
                    # (single) collection family
                    from geedim_spark.operators import masks as _masks
                    fams = {
                        _masks.band_names_for(r[0])
                        for r in coll.df.select("collection")
                        .distinct().collect()
                    }
                    if len(fams) > 1:
                        raise ValueError(
                            "--split bands needs a consistent band set "
                            f"across images (got {sorted(fams)})"
                        )
                    band_names = next(iter(fams)) if fams else None
                    if band_names is not None and args.bands:
                        # --band-name sliced bands BEFORE tiling, so the
                        # snapshot band index b maps into the SELECTED
                        # subset, not the full family list — filter the
                        # family names through the same fullmatch regex
                        # mask_and_tile applied (pipeline.py band_regex)
                        import re as _re
                        regex = "|".join(_re.escape(b) for b in args.bands)
                        band_names = [n for n in band_names
                                      if _re.fullmatch(regex, n)]
                nodata_tag = (args.nodata if args.nodata is not None
                              else _codecs.NODATA_VALS[dtype])
                n_files = sinks.write_image_files(
                    tiles, args.files_dir, bands=nbands,
                    h=int(dims["h"]), w=int(dims["w"]), dtype=dtype,
                    nodata=nodata_tag,
                    overviews=args.overviews,
                    min_overview_dim=args.overview_min_dim,
                    split=args.split, band_names=band_names,
                    driver=args.driver,
                ).count()
                print(f"download: {n_files} GeoTIFFs -> {args.files_dir}")
        elif cmd == "export":
            # toGoogleCloud analog (image.py:862-953 + cli.py:833-905):
            # every type is a snapshot-table commit here; asset/cloud
            # REQUIRE --folder like the reference's MissingParameter
            if args.type in ("asset", "cloud") and not args.folder:
                parsers["export"].error(
                    "'--folder' is required for --type asset|cloud"
                )
            import threading

            folder = args.folder or "geedim_export"
            dest = os.path.join(folder, f"{args.type}_table")
            work = coll
            if args.image_ids:
                from pyspark.sql import functions as F

                from geedim_spark.api import Collection as _Coll
                work = _Coll(
                    coll.df.filter(F.col("image_id").isin(args.image_ids)),
                    coll.cloud_kwargs,
                )
            band_kw = {}
            if args.bands:
                import re as _re
                band_kw["band_regex"] = "|".join(
                    _re.escape(b) for b in args.bands
                )

            def _task(work=work, dest=dest, args=args, band_kw=band_kw):
                snap_id = work.download(
                    dest, max_tile_dim=args.max_tile_dim,
                    apply_cloud_mask=args.apply_mask,
                    export_dtype=args.dtype,
                    scale_offset=args.scale_offset,
                    **band_kw,
                )
                print(f"export: completed snapshot {snap_id} -> {dest}")

            label = f"export-{args.type}-{os.path.basename(folder)}"
            if args.wait:
                # monitorTask analog: run + report inline
                print(f"export: started task {label}")
                _task()
            else:
                t = threading.Thread(target=_task, name=label, daemon=False)
                t.start()
                _pending_tasks.append(t)
                print(f"export: task {label} running (--no-wait)")
    for t in _pending_tasks:
        t.join()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
