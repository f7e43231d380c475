"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` pairs cover the operator inventory from
SURVEY.md §2.  Geedim-side operators (spatial join, masks, tiler, cloud
distance, collection search) run over the deterministic synthetic
image+caption table from :mod:`geedim_spark.synth` — regenerated identically
inside each DuckDB oracle via integer-arithmetic CTEs, so even pixel-level
results (mask portions, EDT distance sums) are value-hash checked against
closed forms.  Training-data operators (dedup, similarity, text) run on the
provided documents/embeddings tables; relational operators on the TPC-H-ish
tables.

Column-name/type parity rules used throughout: ids as strings/BIGINT, counts
as BIGINT, money as BIGINT integer cents (``_cents``; see FIXTURES.md
"Money rounding policy"), ranks from ROW_NUMBER cast to BIGINT, floats only
in ORDER BY (never in output columns) except where rounded.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

import numpy as np
import pandas as pd

from geedim_spark import codecs, geometry, synth
from geedim_spark.operators import (
    collection_ops, composite, dedup, export_ops, masks, multimodal,
    pipeline, similarity, text, tiler,
)
from geedim_spark.operators import spatial_join as sj

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _sizes(sf_dir: str) -> tuple[int, int]:
    sf = synth.sf_from_dir(sf_dir)
    return synth.n_images_for_sf(sf), synth.n_rois_for_sf(sf)


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def _tw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a table, widening a NARROW scan to the session parallelism
    (guide §2.5: one unsplittable input file -> repartition right after
    the read).  The oracle tables ship as a single parquet file, so every
    kernel / higher-order-function map stage otherwise runs in ONE task
    regardless of core count.  Scale-adaptive, not a local[32] constant:
    at production scale the scan already has >= defaultParallelism splits
    and this is a no-op; the round-robin shuffle it adds here moves well
    under a megabyte.  Results are partition-independent (every consumer
    is an aggregate / content-hash / per-row map), so the oracle hashes
    are unchanged."""
    df = spark.read.parquet(_t(sf_dir, name))
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: collection search (date + bounds + portions + custom filter)
    over the synthetic table at sf0.001 — the geedim `search` lifecycle."""
    n, _ = _sizes("/root/testdata/sf0.001")
    images = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")
    rois = synth.rois_df(spark, 20)  # denser ROI set for a richer flagship
    return collection_ops.search(
        images,
        start="2024-01-01",
        end="2025-01-01",
        rois=rois,
        custom_filter="cast(props['CLOUD_COVER'] as int) <= 80",
        cloudless_portion=50.0,
    ).select("image_id", "caption", "time_start", "FILL_PORTION", "CLOUDLESS_PORTION")


# ---------------------------------------------------------------------------
# geedim-side queries (synthetic images + ROI universe)
# ---------------------------------------------------------------------------

def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, m = _sizes(sf_dir)
    return sj.filter_bounds(
        synth.images_meta_df(spark, n), synth.rois_df(spark, m)
    )


def _wrap_lon(v):
    return F.when(v > 180.0, v - 360.0).when(v < -180.0, v + 360.0).otherwise(v)


def q_geo_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geographic filterBounds: footprints/ROIs spread over the globe, many
    crossing the antimeridian (x0 > x1).  Spark runs the wrapped cell
    cover-join + circular-arc refine; the oracle is a brute-force arc
    intersection — an independent check that the cover join loses nothing
    at the seam."""
    n, m = _sizes(sf_dir)
    n, m = min(n, 3000), min(m, 60)
    i = F.col("id").cast("double")
    imgs = spark.range(n).select(
        F.col("id").alias("image_id"),
        ((i * 73 % 3600) / 10.0 - 180.0).alias("cx"),
        ((i * 37 % 1500) / 10.0 - 75.0).alias("cy"),
        (1.0 + i % 7).alias("hw"), (1.0 + i % 5).alias("hh"),
    ).select(
        "image_id",
        _wrap_lon(F.col("cx") - F.col("hw")).alias("x0"),
        (F.col("cy") - F.col("hh")).alias("y0"),
        _wrap_lon(F.col("cx") + F.col("hw")).alias("x1"),
        (F.col("cy") + F.col("hh")).alias("y1"),
    )
    j = F.col("id").cast("double")
    rois = spark.range(m).select(
        F.col("id").alias("roi_id"),
        ((j * 977 % 3600) / 10.0 - 180.0).alias("cx"),
        ((j * 311 % 1400) / 10.0 - 70.0).alias("cy"),
        (3.0 + j % 9).alias("hw"), (2.0 + j % 6).alias("hh"),
    ).select(
        "roi_id",
        _wrap_lon(F.col("cx") - F.col("hw")).alias("rx0"),
        (F.col("cy") - F.col("hh")).alias("ry0"),
        _wrap_lon(F.col("cx") + F.col("hw")).alias("rx1"),
        (F.col("cy") + F.col("hh")).alias("ry1"),
    )
    return sj.filter_bounds(imgs, rois, geo=True)


def q_mask_portions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # staged parquet (identical rows to the generator): the timed plan is a
    # pruned blob scan -> mask kernel, not re-synthesis + encode + phash of
    # every image (the production shape; see _staged_images)
    imgs = _staged_images(spark, sf_dir).filter("fmt = 'raw'")
    return masks.mask_stats(imgs)


def q_landsat_param_portions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag Landsat mask portions over the strip-mock world (reference
    test_mask.py:482-564): ref / mask_shadows=False / mask_cirrus=False /
    +saturation / +nonphysical / +aerosols, exact pixel counts per image.
    Image 0 reproduces the reference fixture's published fractions (FILL
    0.9, CLOUDLESS 0.4/0.6/0.3/0.2/0.1 per flag); the oracle is the strip
    closed form over image_id."""
    n, _ = _sizes(sf_dir)
    ids = spark.range(min(n, 240)).select(F.col("id").alias("image_id"))
    return masks.landsat_param_stats(ids)


def _skew_tables(
    spark: SparkSession, sf_dir: str, hot_tenths: int = 3,
    rows: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Planted-Zipfian join input: cell 0 holds ``hot_tenths``/10 of the
    big side's rows (ids with id%10 < hot_tenths); the rest spread over 97
    tail cells.  The small side is a per-cell attribute table (4
    rows/cell) — too tail-heavy to broadcast at real scale, so the join
    must shuffle on `cell` and eat the hot key.  The driver oracle uses
    the defaults; bench.skew_bench reuses this generator at 50% hot and a
    larger row count (one source of truth for the input shape)."""
    if rows is None:
        n, _ = _sizes(sf_dir)
        rows = n * 10
    big = spark.range(rows).select(
        F.col("id").alias("obs_id"),
        F.when(F.col("id") % 10 < hot_tenths, F.lit(0))
         .otherwise(F.lit(1) + F.col("id") % 97).cast("long").alias("cell"),
        (F.col("id") % 1000).cast("long").alias("v"),
    )
    dim = spark.range(98).select(F.col("id").alias("cell")).crossJoin(
        spark.range(4).select(F.col("id").alias("attr"))
    ).select(
        "cell", (F.col("cell") * 4 + F.col("attr")).cast("long").alias("weight")
    )
    return big, dim


def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-adaptive equi-join under a planted hot cell (north-rule skew
    case): cell 0 carries 30% of the rows, so a plain hash join puts 30% of
    the work in one task.  adaptive_salted_join pre-splits the hot key into
    count-derived salt buckets (tail keys pay zero replication); the result
    must equal the plain join — per-cell match counts and weighted sums
    against a closed-form oracle."""
    big, dim = _skew_tables(spark, sf_dir)
    joined = sj.adaptive_salted_join(big, dim, "cell", rows_per_task=1000)
    return joined.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("v") * F.col("weight")).cast("long").alias("wsum"),
    )


def q_streaming_score_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join (streaming/ingest.stream_score_join_stats):
    streaming image micro-batches broadcast-joined per batch against a
    static Cloud Score+ table — stateless, constant memory at any stream
    length.  Drained commits == the batch s2_score_mask_stats strip
    closed forms (incl. the unmatched -> fully-masked default), which is
    the oracle."""
    import shutil
    import tempfile

    from geedim_spark.sources import snapshots
    from geedim_spark.streaming import ingest

    n, _ = _sizes(sf_dir)
    n = min(n, 600)
    base = tempfile.mkdtemp(prefix="geedim_stream_scorejoin_")
    try:
        synth.images_df(spark, n).coalesce(4).write.parquet(f"{base}/in")
        scores = synth.scores_df(spark, n)
        q = ingest.stream_score_join_stats(
            spark, f"{base}/in", scores, f"{base}/tbl", f"{base}/ckpt",
            available_now=True,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream-static join did not drain in 300 s")
        out = snapshots.read_snapshot(spark, f"{base}/tbl").select(
            "image_id", "total_px", "fill_px", "cloudless_px",
            "score_matched",
        )
        return spark.createDataFrame(
            out.collect(),
            "image_id string, total_px long, fill_px long, "
            "cloudless_px long, score_matched boolean",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_streaming_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming ingest (file source -> foreachBatch mask kernel
    -> snapshot commits) drained with availableNow; returns the committed
    snapshot stats.  Streaming == batch at drain, so the result value-checks
    against the same closed forms as the batch mask pipeline."""
    import shutil
    import tempfile

    from geedim_spark.sources import snapshots
    from geedim_spark.streaming import ingest

    n, _ = _sizes(sf_dir)
    n = min(n, 600)
    # UNIQUE temp dir (two drivers on one host must not rmtree each
    # other's table mid-run) + EAGER materialisation so the whole dir can
    # go in finally — same contract as _drained_events_stream
    base = tempfile.mkdtemp(prefix="geedim_stream_ingest_")
    try:
        synth.images_df(spark, n).coalesce(4).write.parquet(f"{base}/in")
        q = ingest.stream_mask_stats(
            spark, f"{base}/in", f"{base}/tbl", f"{base}/ckpt",
            available_now=True,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming ingest did not drain within 300 s")
        out = snapshots.read_snapshot(spark, f"{base}/tbl").select(
            "image_id", "total_px", "fill_px", "cloudless_px"
        )
        return spark.createDataFrame(
            out.collect(),
            "image_id string, total_px long, fill_px long, cloudless_px long",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_cloud_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # staged parquet: pruned blob scan -> EDT kernel (see q_mask_portions)
    imgs = _staged_images(spark, sf_dir).filter("fmt = 'raw'")
    return masks.cloud_dist_stats(imgs, scale=synth.SCALE, max_cloud_dist=5000.0)


def q_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, _ = _sizes(sf_dir)
    imgs = synth.images_meta_df(spark, n)
    tiles = tiler.explode_tiles(imgs, bands=2, max_tile_dim=21, max_tile_bands=1)
    return tiles.select(
        "image_id",
        F.col("band_start").cast("int").alias("band_start"),
        F.col("band_stop").cast("int").alias("band_stop"),
        F.col("row_start").cast("int").alias("row_start"),
        F.col("row_stop").cast("int").alias("row_stop"),
        F.col("col_start").cast("int").alias("col_start"),
        F.col("col_stop").cast("int").alias("col_stop"),
    )


def q_export_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile export (decode once -> slice -> encode): verified end-to-end by
    per-tile pixel sums against the strip closed form."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")
    tiles = export_ops.export_tiles(imgs, max_tile_dim=21, max_tile_bands=1)

    def _sums(it):
        for pdf in it:
            sums = [
                int(codecs.decode(bytes(buf)).sum(dtype="int64"))
                for buf in pdf["tile_bytes"]
            ]
            out = pdf[["image_id", "caption", "band_start", "row_start",
                       "col_start"]].copy()
            out["pxsum"] = sums
            yield out

    return tiles.mapInPandas(
        _sums,
        schema="image_id string, caption string, band_start int, "
               "row_start int, col_start int, pxsum long",
    )


def q_mask_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster -> vector: vectorise each image's fill and cloud masks into
    polygons (geometry.mask_to_polygons), then rasterise back
    (polygon_to_mask) to verify the inverse property in-kernel; outputs
    polygon counts + exact vector areas (strip masks -> closed forms)."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")

    def _batch(it):
        for pdf in it:
            rows = []
            for image_id, buf, tf in zip(pdf["image_id"], pdf["bytes"], pdf["transform"]):
                px = codecs.decode(bytes(buf))
                tf = np.asarray(tf, dtype=np.float64)
                fill = px[0] != 0
                cloud = px[1] != 0  # the QA strip, family-independent
                out = {"image_id": image_id}
                for name, mask in [("fill", fill), ("cloud", cloud)]:
                    polys = geometry.mask_to_polygons(mask, tf)
                    back = np.zeros(mask.shape, bool)
                    area = 0.0
                    for p in polys:
                        x0, y0, x1, y1 = geometry.polygon_bounds(p)
                        area += (x1 - x0) * (y1 - y0)
                        back |= geometry.polygon_to_mask(p, tf, *mask.shape)
                    assert np.array_equal(back, mask)  # inverse property
                    out[f"n_{name}_polys"] = len(polys)
                    out[f"{name}_area"] = int(round(area))
                rows.append(out)
            yield pd.DataFrame(rows, columns=[
                "image_id", "n_fill_polys", "fill_area", "n_cloud_polys", "cloud_area",
            ])

    src = imgs.select("image_id", "bytes", "transform")
    return src.mapInPandas(
        _batch,
        schema="image_id string, n_fill_polys int, fill_area long, "
               "n_cloud_polys int, cloud_area long",
    )


def q_s2_score_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: broadcast left-outer join to the cloud-score match table; NULL
    payload -> fully-masked default (scores exist for even i only)."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")
    scores = synth.scores_df(spark, n)
    return masks.s2_score_mask_stats(imgs, scores, score_thresh=0.6)


def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 resampling with exact oracles: 4x block-mean downsample (the QA
    strip is NOT 4-aligned, so blocks carry fractional means — real
    averaging, not subsampling) and 2x bilinear upsample (pixel-centre
    convention + edge clamp reproduced column-by-column in SQL).  All
    values are exact dyadic rationals -> order-independent float sums."""
    from geedim_spark.operators import resample as rs

    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")

    def _batch(it):
        for pdf in it:
            rows = []
            for image_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                px = codecs.decode(bytes(buf))
                avg = rs.resample(px, px.shape[1] // 4, px.shape[2] // 4, "average")
                bil = rs.resample(px[:1], px.shape[1], px.shape[2] * 2, "bilinear")
                bic = rs.resample(px[:1], px.shape[1], px.shape[2] * 2, "bicubic")
                rows.append({
                    "image_id": image_id,
                    "avg_b0_sum": float(avg[0].sum()),
                    "avg_qa_sum": float(avg[1].sum()),
                    "bilin_b0_sum": float(bil[0].sum()),
                    "bicub_b0_sum": float(bic[0].sum()),
                })
            yield pd.DataFrame(rows, columns=[
                "image_id", "avg_b0_sum", "avg_qa_sum", "bilin_b0_sum",
                "bicub_b0_sum",
            ])

    return imgs.select("image_id", "bytes").mapInPandas(
        _batch,
        schema="image_id string, avg_b0_sum double, avg_qa_sum double, "
               "bilin_b0_sum double, bicub_b0_sum double",
    )


def q_prepare_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prepareForExport plan rewrite (image.py:741-862): per-band
    scale/offset then SATURATING uint8 cast (clip-then-truncate,
    image.py:571-596).  Band 0 exercises both clip ends (1.75v-20 spans
    -18.25..330); the untouched QA band saturates its 512/1024 bits to
    255.  All arithmetic is exact dyadics, so the truncation is
    engine-unambiguous."""
    from geedim_spark.operators import export_ops

    n, _ = _sizes(sf_dir)
    # caption pass-through is a property of export_ops.prepare_for_export
    # itself (its fixed output schema), not of any projection here
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")
    prepped = export_ops.prepare_for_export(
        imgs, scale_offset={0: (1.75, -20.0)}, dtype="uint8"
    )

    def _batch(it):
        for pdf in it:
            rows = []
            for image_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                px = codecs.decode(bytes(buf))
                rows.append({
                    "image_id": image_id,
                    "b0_sum": int(px[0].sum(dtype=np.int64)),
                    "qa_sum": int(px[1].sum(dtype=np.int64)),
                })
            yield pd.DataFrame(rows, columns=["image_id", "b0_sum", "qa_sum"])

    return prepped.select("image_id", "bytes").mapInPandas(
        _batch, schema="image_id string, b0_sum long, qa_sum long"
    )


def q_mask_clouds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 pixel-mask predicate: updateMask(CLOUDLESS_MASK) writes nodata
    into non-cloudless pixels (mask.py:131-133) — the surviving band-0 sum
    equals v * cloudless_width * h per family closed form (mock rows pass
    through unmasked, which coincides with their cloudless == fill)."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")
    masked = masks.mask_clouds(imgs)

    def _batch(it):
        for pdf in it:
            out = pdf[["image_id"]].copy()
            out["masked_sum"] = [
                int(codecs.decode(bytes(b))[0].sum(dtype=np.int64))
                for b in pdf["bytes"]
            ]
            yield out

    return masked.select("image_id", "bytes").mapInPandas(
        _batch, schema="image_id string, masked_sum long"
    )


def q_band_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 STAC-analog dimension join through the driver gate: the static
    band-properties catalog broadcast-joins onto every image and the B1
    scale/offset converts the exact integer pixel sum to reflectance
    (image.py:137-172 semantics, applied as scale*sum + offset*n — one
    float op per image, bit-identical across engines)."""
    from geedim_spark.sources import band_props

    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")
    joined = band_props.with_scale_offset(imgs, band_props.band_props_df(spark))

    def _batch(it):
        for pdf in it:
            rows = []
            for image_id, buf, so in zip(
                pdf["image_id"], pdf["bytes"], pdf["band_so"]
            ):
                px = codecs.decode(bytes(buf))
                b1 = so[0]  # sorted (len, name): B1 first
                pxsum = int(px[0].sum(dtype=np.int64))
                rows.append({
                    "image_id": image_id,
                    "b1_scale": float(b1["scale"]),
                    "refl_sum": float(b1["scale"]) * pxsum
                    + float(b1["offset"]) * px[0].size,
                })
            yield pd.DataFrame(rows, columns=["image_id", "b1_scale", "refl_sum"])

    return joined.select("image_id", "bytes", "band_so").mapInPandas(
        _batch, schema="image_id string, b1_scale double, refl_sum double"
    )


def q_geotiff_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 GeoTIFF container through the driver gate: every image writes a
    striped-deflate GeoTIFF executor-side (pure-numpy writer), the
    hand-rolled parser reads it back, and pixel/transform/CRS/nodata
    equality is emitted as boolean columns (files live only inside the
    kernel call — write, verify, delete)."""
    import tempfile

    from geedim_spark.sources import geotiff

    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(
        spark, min(n, 600), scalar_filter="fmt = 'raw'"
    ).select("image_id", "bytes", "transform", "crs")

    def _batch(it):
        for pdf in it:
            rows = []
            for image_id, buf, tf, crs in zip(
                pdf["image_id"], pdf["bytes"], pdf["transform"], pdf["crs"]
            ):
                px = codecs.decode(bytes(buf))
                tf = [float(t) for t in tf]
                epsg = int(str(crs).split(":", 1)[1])
                fd, path = tempfile.mkstemp(suffix=".tif")
                os.close(fd)
                try:
                    geotiff.write_geotiff(
                        path, px, transform=tf, crs_epsg=epsg, nodata=0,
                        compress="deflate", overwrite=True,  # mkstemp'd
                    )
                    got, meta = geotiff.read_geotiff(path)
                finally:
                    os.remove(path)
                rows.append({
                    "image_id": image_id,
                    "pixels_ok": bool(np.array_equal(got, px)),
                    "transform_ok": meta.get("transform") == tf,
                    "crs_ok": meta.get("crs_epsg") == epsg,
                    "nodata_ok": meta.get("nodata") == 0.0,
                })
            yield pd.DataFrame(rows, columns=[
                "image_id", "pixels_ok", "transform_ok", "crs_ok", "nodata_ok",
            ])

    return imgs.mapInPandas(
        _batch,
        schema="image_id string, pixels_ok boolean, transform_ok boolean, "
               "crs_ok boolean, nodata_ok boolean",
    )


def q_sort_portion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: rank the collection by CLOUDLESS_PORTION descending
    (sort_for_composite(by_portion=True), collection.py:409-418), ties by
    image_id — the portion doubles are identical IEEE ratios of the exact
    pixel counts on both engines."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")
    stats = masks.with_portions(masks.mask_stats(imgs)).select(
        "image_id", F.col("cloudless_portion").alias("CLOUDLESS_PORTION"),
    )
    keyed = composite.sort_for_composite(stats, "mosaic", by_portion=True)
    # global unpartitioned window: bounded by CONTRACT — this ranks
    # IMAGES, and the reference caps collections at 5000
    # (collection.py:102 _max_export_images), so the single partition holds
    # <= 5000 metadata rows.  Do NOT lift this shape into an unbounded
    # context (see text.top_ngrams for the distributed top-k pattern).
    w = Window.orderBy(F.desc("sort_key"), F.asc("image_id"))
    return keyed.select(
        "image_id", F.row_number().over(w).cast("long").alias("rank")
    )


_STREAM_Q_SEQ = [0]


def _drained_events_stream(spark, sf_dir, start_fn, finalize, out_schema):
    """Shared scaffold for drained-stream queries over the events table:
    stage to a UNIQUE temp dir (two drivers on one host must not rmtree
    each other's staged input mid-run), start the availableNow stream via
    ``start_fn(src_dir, ckpt_dir, sink_name)``, materialise
    ``finalize(sink_table)`` off the memory sink, clean up."""
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="geedim_stream_q_")
    _STREAM_Q_SEQ[0] += 1
    sink = f"q_stream_sink_{_STREAM_Q_SEQ[0]}"
    try:
        events = spark.read.parquet(_t(sf_dir, "events"))
        events.coalesce(4).write.parquet(f"{base}/in")  # 4 files -> 2 batches
        q = start_fn(f"{base}/in", f"{base}/ckpt", sink)
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream did not drain within 300 s")
        return spark.createDataFrame(finalize(spark.table(sink)).collect(),
                                     out_schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_streaming_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling event-time windows (streaming/windows.py)
    drained with availableNow in update mode: the max-per-window of the
    incremental emissions equals the batch window aggregation — value-
    checked against DuckDB's date_trunc.  The watermark exceeds the
    table's time span: micro-batch replay is not time-ordered, so a short
    watermark could drop genuinely-late rows nondeterministically (that
    semantic is pytest-covered); batch parity needs every row retained."""
    from geedim_spark.streaming import windows as sw

    return _drained_events_stream(
        spark, sf_dir,
        lambda src, ckpt, sink: sw.stream_windowed_counts(
            spark, src, ckpt, window="1 day", watermark="90 days",
            sink_table=sink, output_mode="update",
        ),
        lambda t: t.groupBy("window_start", "event_type")
                   .agg(F.max("n").cast("long").alias("n")),
        "window_start timestamp, event_type string, n long",
    )


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows on a DRAINED stream (complete mode: sessions
    MERGE so update emissions are unsupported; the memory sink replaces its
    contents per batch, holding exactly the final merged sessions at
    drain) — must equal the batch gap-rule closed form, the same oracle as
    the batch `session_windows` query."""
    from geedim_spark.streaming import windows as sw

    return _drained_events_stream(
        spark, sf_dir,
        lambda src, ckpt, sink: sw.stream_session_counts(
            spark, src, ckpt, gap="30 minutes", watermark="90 days",
            sink_table=sink,
        ),
        lambda t: t.select(
            "user_id", "session_start", F.col("n").alias("n_events")
        ),
        "user_id long, session_start timestamp, n_events long",
    )


def q_halo_edt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 halo join through an exact oracle: tiled EDT (16 px tiles, 20 px
    halo = the clamp reach, so tiled == whole image bit-for-bit per the
    stencil exactness contract) over the Landsat family, per-image clamped
    distance sums vs the strip closed form.  This is the hardest
    correctness surface (SURVEY §7.3 #1): the kRing replication, halo
    assembly offsets, ragged-edge tiles (40 = 2x16 + 8) and the
    invalid-pixel exclusion are all pinned by the value hash."""
    from geedim_spark.operators import stencil

    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(
        spark, min(n, 1200), scalar_filter="fmt = 'raw' AND i % 3 = 1"
    )
    tiles = stencil.mask_tiles(imgs, tile_h=16, tile_w=16, plane="code")
    out = stencil.halo_apply(
        tiles, stencil.cloud_dist_code_kernel(scale=synth.SCALE, max_cloud_dist=200.0),
        halo_px=20, tile_h=16, tile_w=16, out_dtype="float64",
    )

    def _sums(it):
        for pdf in it:
            sums = [
                int(codecs.decode(bytes(b))[0].sum(dtype=np.float64))
                for b in pdf["tile_bytes"]
            ]
            out = pdf[["image_id"]].copy()
            out["part_sum"] = sums
            yield out

    parts = out.mapInPandas(_sums, schema="image_id string, part_sum long")
    return parts.groupBy("image_id").agg(
        F.sum("part_sum").cast("long").alias("dist_sum")
    )


def q_s2_qa_portions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 default-path masking through mask_stats dispatch (mask.py:536-544):
    qa method with no match table — QA60 bit 10/11 cloud, the 2022-02 ..
    2024-02 unpopulated window computed from time_start (mask.py:379-385;
    synthetic rows i <= 744 fall inside it), and the qa pipeline's
    open(20 m)+dilate(50 m) morphology (mask.py:466-472) — all exact strip
    closed forms."""
    imgs = _staged_images(spark, sf_dir).filter("fmt = 'raw' AND i % 3 = 2")
    return masks.mask_stats(imgs)


def q_s2_score_thresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cloud-score, 0.4) threshold delta vs the 0.6 default of
    s2_score_join (test_mask.py:597-656 shape): at 0.4 both score levels
    (0.5 / 0.9) are clear, so matched rows go fully cloudless while
    unmatched rows still hit the fully-masked default."""
    n, _ = _sizes(sf_dir)
    imgs = _staged_images(spark, sf_dir).filter("fmt = 'raw'")
    scores = synth.scores_df(spark, n)
    return masks.s2_score_mask_stats(imgs, scores, score_thresh=0.4)


def q_s2_prob_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cloud-prob, 60) method pair: probability match-join through the
    full qa/prob pipeline (threshold -> morphology, mask.py:393-399 +
    466-472); the left prob strip erodes 2 px then dilates 5 px, giving a
    closed-form cloudless width."""
    n, _ = _sizes(sf_dir)
    imgs = _staged_images(spark, sf_dir).filter("fmt = 'raw'")
    probs = synth.probs_df(spark, n)
    return masks.s2_prob_mask_stats(imgs, probs, prob_thresh=60.0)


def q_s2_shadow_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 cast-shadow parameterisation (mask.py:331-372) over the shadow
    strip mock (masks.s2_shadow_strip_bands — test_mask.py strip
    construction): five configs through the masks_for dispatch isolate
    the dark threshold (B8 < dark*1e4), the SR SCL==6 water exclusion,
    the shadow_dist projection reach and mask_shadows — all exact strip
    closed forms incl. the qa pipeline's open(2 px)+dilate(5 px)
    morphology (see masks.s2_shadow_param_stats)."""
    n, _ = _sizes(sf_dir)
    ids = spark.range(min(n, 240)).select(F.col("id").alias("image_id"))
    return masks.s2_shadow_param_stats(ids)


def q_band_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 regex band select: keep 'B.*' bands, verify via decoded pixel sum
    (the QA band's bits must vanish from the payload)."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")
    sel = export_ops.select_bands(imgs, "B.*")

    def _sums(it):
        for pdf in it:
            out = pdf[["image_id", "n_bands"]].copy()
            out["pxsum"] = [
                int(codecs.decode(bytes(b)).sum(dtype="int64")) for b in pdf["bytes"]
            ]
            yield out

    return sel.mapInPandas(
        _sums, schema="image_id string, n_bands int, pxsum long"
    )


def q_cdi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: CDI refinement via the TOA-twin broadcast join — effective cloud
    = QA strip ∩ CDI strip (closed form: min(c_px, d_px) columns)."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")
    cdi = synth.cdi_df(spark, n)
    return masks.cdi_mask_stats(imgs, cdi, cdi_thresh=-0.5)


def q_morphology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W3: disk dilation/erosion + directional shadow projection on the
    cloud strip — full-height strips give closed-form pixel counts.

    azimuth 180 = west: the cast region is the npix columns left of the
    strip; a disk of radius r dilates/erodes a full-height strip by exactly
    r columns (clipped at edges; erosion treats beyond-image as set)."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")

    def _batch(it):
        for pdf in it:
            rows = []
            for image_id, buf in zip(pdf["image_id"], pdf["bytes"]):
                px = codecs.decode(bytes(buf))
                cloud = px[1] != 0  # the QA strip, family-independent
                cast = masks.directional_project(cloud, 180.0, 5)
                rows.append({
                    "image_id": image_id,
                    "cast_px": int(cast.sum()),
                    "dilated_px": int(masks.focal_max(cloud, 2).sum()),
                    "eroded_px": int(masks.focal_min(cloud, 2).sum()),
                })
            yield pd.DataFrame(rows, columns=[
                "image_id", "cast_px", "dilated_px", "eroded_px",
            ])

    return imgs.select("image_id", "bytes").mapInPandas(
        _batch,
        schema="image_id string, cast_px long, dilated_px long, eroded_px long",
    )


def q_dct8_psnr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint invariant as a query: every lossy dct8 image decodes at
    PSNR >= 40 dB vs the analytically-reconstructed original, and captions
    survive the decode path untouched."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'dct8'")

    def _batch(it):
        for pdf in it:
            rows = []
            for image_id, caption, buf, i, v, f_px, c_px, w, h in zip(
                pdf["image_id"], pdf["caption"], pdf["bytes"], pdf["i"],
                pdf["v"], pdf["f_px"], pdf["c_px"], pdf["w"], pdf["h"],
            ):
                dec = codecs.decode(bytes(buf))
                orig = np.zeros((2, h, w), np.uint16)
                orig[0, :, :] = v
                orig[0, :, :f_px] = 0
                if c_px:
                    orig[1, :, w - c_px:] = 1 << (10 if i % 3 == 2 else 9)
                p = codecs.psnr(orig, dec, 1023.0)
                rows.append({
                    "image_id": image_id, "caption": caption,
                    "psnr_ok": bool(p >= 40.0),
                })
            yield pd.DataFrame(rows, columns=["image_id", "caption", "psnr_ok"])

    return imgs.select(
        "image_id", "caption", "bytes", "i", "v", "f_px", "c_px", "w", "h"
    ).mapInPandas(_batch, schema="image_id string, caption string, psnr_ok boolean")


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features, rounded to 6 dp for cross-engine floats."""
    docs = _tw(spark, sf_dir, "documents")
    q = text.quality_score(docs)
    return q.select(
        "doc_id",
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
    )


def q_tiled_portions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 as a true 2-phase hash agg over the tiles table: per-tile partial
    counts from the fused kernel -> groupBy(image_id) final sums."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")
    tiles = pipeline.mask_and_tile(
        imgs, scale=synth.SCALE, max_tile_dim=21, max_tile_bands=1,
        apply_cloud_mask=False,
    )
    # band tiles repeat the spatial counts -> aggregate band-0 tiles only
    return tiles.filter("band_start = 0").groupBy("image_id").agg(
        F.sum("fill_px").cast("long").alias("fill_px"),
        F.sum("cloudless_px").cast("long").alias("cloudless_px"),
        F.count(F.lit(1)).cast("long").alias("n_tiles"),
    )


def _staged_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth images materialised to parquet once per (n) — for MULTI-PASS
    queries.  search() executes the images lineage 3-4x (bounds cover,
    stats kernel, output side); over the mapInPandas generator every pass
    re-encodes blobs (a UDF barrier defeats column pruning), while over
    parquet the meta-only passes are pruned scans that never read the bytes
    column (the production shape: ReadSchema drops `bytes`)."""
    n, _ = _sizes(sf_dir)
    path = f"/tmp/geedim_spark_staged_images_n{n}_{synth.recipe_hash()}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        # uncompressed + 32 files: fast parallel write, and the scan gets
        # one task per file regardless of how well the strips compress
        (
            synth.images_df(spark, n).repartition(32)
            .write.mode("overwrite").option("compression", "none").parquet(path)
        )
    return spark.read.parquet(path)


def q_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, m = _sizes(sf_dir)
    images = _staged_images(spark, sf_dir).filter("fmt = 'raw'")
    rois = synth.rois_df(spark, m)
    found = collection_ops.search(
        images,
        start="2024-01-01",
        end="2025-06-01",
        rois=rois,
        custom_filter="cast(props['CLOUD_COVER'] as int) <= 50",
        cloudless_portion=60.0,
    )
    return found.select("image_id", "caption", "time_start")


def q_date_filter_1ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """end defaults to start + 1 ms (collection.py:597-599): exactly the
    image captured at that instant survives."""
    n, _ = _sizes(sf_dir)
    images = synth.images_meta_df(spark, n)
    return collection_ops.filter_date(images, "2024-01-01 05:00:00").select(
        "image_id", "time_start"
    )


def _column_profile(comp_df: DataFrame, colname: str) -> DataFrame:
    """Composite (1 row of bytes) -> per-column band-0 values (x, value).
    Strip images are constant down each column, so row 0 is the profile."""
    def _go(it):
        for pdf in it:
            rows = []
            for buf in pdf["bytes"]:
                px = codecs.decode(bytes(buf))
                for x in range(px.shape[2]):
                    rows.append({"x": x, colname: float(px[0, 0, x])})
            yield pd.DataFrame(rows, columns=["x", colname])

    return comp_df.mapInPandas(_go, schema=f"x int, {colname} double")


def q_composite_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mean/median/mosaic composites over the co-registered MOCK family,
    checked per-column against analytic SQL (integer sums -> exact floats)."""
    n, _ = _sizes(sf_dir)
    # staged parquet: the three composite branches each re-execute the
    # images lineage; over the generator that is 3x blob re-encodes, over
    # parquet it is 3 pruned scans (see _staged_images)
    imgs = _staged_images(spark, sf_dir).filter(
        "i % 3 = 0 AND fmt = 'raw' AND i < 900"
    )
    mean_p = _column_profile(composite.composite_collection(imgs, "mean"), "mean_v")
    med_p = _column_profile(composite.composite_collection(imgs, "median"), "median_v")
    mos_p = _column_profile(composite.composite_collection(imgs, "mosaic"), "mosaic_v")
    return mean_p.join(med_p, "x").join(mos_p, "x")


def _tiled_column_profile(tiles: DataFrame, colname: str) -> DataFrame:
    """Per-(tile, column) band-0 profile of a tiled composite.  All-masked
    pixels (NaN in the composite) are dropped — oracles drop the same
    columns via their valid-pixel CTEs, keeping both row sets equal."""
    import math

    def _profile(it):
        for pdf in it:
            rows = []
            for tr, tc, buf in zip(pdf["tr"], pdf["tc"], pdf["bytes"]):
                px = codecs.decode(bytes(buf))
                for xl in range(px.shape[2]):
                    v = float(px[0, 0, xl])
                    if math.isnan(v):
                        continue
                    rows.append({
                        "tr": int(tr), "tc": int(tc), "x_local": xl,
                        colname: v,
                    })
            yield pd.DataFrame(rows, columns=["tr", "tc", "x_local", colname])

    return tiles.mapInPandas(
        _profile, schema=f"tr int, tc int, x_local int, {colname} double"
    )


def q_composite_tiled_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-keyed mean composite (the 10^12-scale grouping) — per-column
    values checked against the same closed form as the whole-image path."""
    n, _ = _sizes(sf_dir)
    imgs = _staged_images(spark, sf_dir).filter(
        f"i % 3 = 0 AND fmt = 'raw' AND i < {min(n, 900)}"
    )
    tiles = composite.composite_tiled(imgs, "mean", tile_h=20, tile_w=20)
    return _tiled_column_profile(tiles, "mean_v")


def q_composite_tiled_qmosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-keyed q-mosaic over the Landsat-like family: per-tile cloud
    distance (exact EDT on each tile's own cloudless block) drives an
    argmax composite.  For the strip world the per-tile EDT has a closed
    form (fill strips only ever intersect tile column 0, cloud strips only
    tile column 1), so the whole argmax pipeline value-checks in SQL.

    Every input has a nonzero fill AND cloud strip (i%5<>0, i%7<>0).
    Invalid (nodata) pixels are NOT distance sources (mask.py:102-104), so
    tc=0 tiles (fill strip, no cloud strip) saturate at the 5000 clamp and
    exercise the (time DESC, id) tie order, while tc=1 tiles rank by the
    finite distance to the cloud strip.  What this pins: cloud-only EDT
    sources, the valid-set masking, the (cd DESC, time DESC, id)
    preference ordering, and the symmetric dropping of all-masked columns.
    Strip cd curves share a slope, so the winner is constant per tile by
    geometry — per-pixel winner VARIATION is covered by the direct argmax
    unit test (test_qmosaic_argmax_clouddist) and EDT value exactness by
    the `cloud_dist` query; this query pins the pipeline between them."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(
        spark, min(n, 900),
        scalar_filter="i % 3 = 1 AND fmt = 'raw' AND i % 5 <> 0 AND i % 7 <> 0",
    )
    tiles = composite.composite_tiled(
        imgs, "q-mosaic", tile_h=20, tile_w=20, scale=synth.SCALE
    )
    return _tiled_column_profile(tiles, "qmosaic_v")


def q_qmosaic_halo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-image-EDT q-mosaic at tile-bounded memory
    (composite_tiled_qmosaic_halo): the halo join supplies each 16 px tile
    the exact whole-image CLOUD_DIST (clamp 200 m -> 20 px halo), so the
    per-column winner is the global distance argmax — no per-tile
    saturation branch in the oracle, unlike composite_tiled_qmosaic."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(
        spark, min(n, 900),
        scalar_filter="fmt = 'raw' AND i % 3 = 1 AND i % 5 <> 0 AND i % 7 <> 0",
    )
    tiles = composite.composite_tiled_qmosaic_halo(
        imgs, tile_h=16, tile_w=16, scale=synth.SCALE, max_cloud_dist=200.0
    )
    return _tiled_column_profile(tiles, "qmosaic_v")


def q_medoid_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Medoid composite over cloud-free MOCK images (QA all zero -> pure-B1
    integer distances, exactly reproducible in SQL)."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(
        spark, min(n, 210),
        scalar_filter="i % 3 = 0 AND fmt = 'raw' AND c_px = 0"
    )
    return _column_profile(
        composite.composite_collection(imgs, "medoid"), "medoid_v"
    )


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction: band-0 mean from decoded pixels,
    exact vs the strip closed form."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_df(spark, n, scalar_filter="fmt = 'raw'")
    feats = multimodal.image_features(imgs)
    return feats.select(
        "image_id", F.element_at("band_means", 1).alias("mean_b1")
    )


def q_sort_date_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: rank by |t - target date| descending (collection.py:392-398),
    explicit (dist, image_id) total order."""
    n, _ = _sizes(sf_dir)
    images = synth.images_meta_df(spark, n)
    target = F.to_timestamp(F.lit("2024-02-01 00:00:00")).cast("double")
    dist = F.abs(F.col("time_start").cast("double") - target)
    # global unpartitioned window: bounded by the reference's 5000-image
    # collection cap (collection.py:102) — image-metadata rows only; see
    # q_sort_portion's note
    w = Window.orderBy(F.desc(dist), F.asc("image_id"))
    return images.select(
        "image_id", F.row_number().over(w).cast("long").alias("rank")
    )


def q_collection_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5: min/max over the collection + aggregate_array
    (collection.py:719-723; collect_list)."""
    n, _ = _sizes(sf_dir)
    images = synth.images_meta_df(spark, n)
    return images.groupBy("collection").agg(
        F.min("time_start").alias("min_ts"),
        F.max("time_start").alias("max_ts"),
        F.count(F.lit(1)).cast("long").alias("n_images"),
        # join to one string: array<string> output columns crash the driver's
        # pandas canonicalizer (unhashable list) — aggregate_array semantics
        # stay exercised, the hashable projection is concat_ws
        F.concat_ws(
            "|", F.slice(F.sort_array(F.collect_list("caption")), 1, 3)
        ).alias("first_captions"),
    )


def q_union_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/U1: fromImages union + per-collection distinct count."""
    n, _ = _sizes(sf_dir)
    images = synth.images_meta_df(spark, n)
    a = images.filter("i % 2 = 0")
    b = images.filter("i % 3 = 0")
    u = a.unionByName(b).select("image_id", "collection").distinct()
    return u.groupBy("collection").agg(F.count(F.lit(1)).cast("long").alias("n"))


def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 strings: id split (utils.py:90-105), '/'->'-' safe name
    (download.py:82-86), acronym abbreviation (collection.py:84-97)."""
    n, _ = _sizes(sf_dir)
    images = synth.images_meta_df(spark, n)
    return images.select(
        "image_id",
        F.element_at(F.split("image_id", "/"), -1).alias("index_part"),
        F.regexp_replace("image_id", "/", "-").alias("safe_name"),
        F.concat_ws(
            "", F.transform(F.split("collection", "/"), lambda p: p.substr(1, 1))
        ).alias("abbrev"),
    )


def q_limit_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/O5: deterministic top-N (sorted limit, the 5000-image export cap
    shape, collection.py:102)."""
    events = spark.read.parquet(_t(sf_dir, "events"))
    return (
        events.orderBy(F.asc("ts"), F.asc("event_id")).limit(100)
        .select("event_id", "user_id")
    )


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionisation: 30-min-gap session windows per user (lag + running
    sum) — the batch analog of streaming session windows."""
    events = spark.read.parquet(_t(sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ: hop via TIMESTAMP to epoch seconds (session tz UTC)
    epoch = F.col("ts").cast("timestamp").cast("double")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        events.withColumn("ns", new_sess)
        .withColumn("session_idx", F.sum("ns").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .select("event_id", "user_id", "session_idx")
    )


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window, 30-min gap) vs the
    lag+cumsum sessionisation the oracle builds — pins Spark's
    session-merge semantics (start = first event, window closes after a
    30-min silence) against the closed gap-based form."""
    events = spark.read.parquet(_t(sf_dir, "events"))
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events",
        )
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tw(spark, sf_dir, "documents")
    return dedup.simhash_df(docs, bits=16, n=5)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle Jaccard for consecutive doc pairs (verification-stage
    op of the dedup pipeline)."""
    docs = _tw(spark, sf_dir, "documents")
    pairs = docs.filter("doc_id < 100").select(
        F.col("doc_id").alias("doc_id_a"), (F.col("doc_id") + 1).alias("doc_id_b")
    )
    return dedup.ngram_jaccard(docs, pairs, n=5)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tw(spark, sf_dir, "documents")
    return text.lang_id(docs)


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text.fingerprint(docs)


# ---------------------------------------------------------------------------
# relational queries (TPC-H-ish provided tables)
# ---------------------------------------------------------------------------

def _cents(c) -> F.Column:
    """Money convention (FIXTURES.md §rounding): DOUBLE dollars -> BIGINT
    integer cents via round(x*100).  All money aggregation is then exact
    int64 arithmetic — identical on every engine, immune to decimal-scale
    and trailing-zero canonicalization differences (DuckDB's pandas bridge
    renders DECIMAL as float64; Spark keeps Decimal objects)."""
    return F.round(F.col(c) * 100).cast("long")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    # disc price in 1e-4 dollars: cents * (100 - disc_cents) is exact int64
    disc_c4 = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_price_cents"),
            F.sum(disc_c4).alias("sum_disc_price_c4"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(_t(sf_dir, "orders"))
    customer = spark.read.parquet(_t(sf_dir, "customer"))
    nation = spark.read.parquet(_t(sf_dir, "nation"))
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_cents("o_totalprice")).alias("total_spent_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .orderBy(F.desc("total_spent_cents"), F.asc("c_custkey"))
        .limit(10)
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered both sides, grouped revenue,
    deterministic top-10."""
    customer = spark.read.parquet(_t(sf_dir, "customer"))
    orders = spark.read.parquet(_t(sf_dir, "orders"))
    lineitem = spark.read.parquet(_t(sf_dir, "lineitem"))
    disc_c4 = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .where(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
            & (F.col("l_shipdate") > F.lit("1998-01-01"))
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(disc_c4).alias("revenue_c4"))
        .orderBy(F.desc("revenue_c4"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join through region, grouped revenue."""
    customer = spark.read.parquet(_t(sf_dir, "customer"))
    orders = spark.read.parquet(_t(sf_dir, "orders"))
    lineitem = spark.read.parquet(_t(sf_dir, "lineitem"))
    supplier = spark.read.parquet(_t(sf_dir, "supplier"))
    nation = spark.read.parquet(_t(sf_dir, "nation"))
    region = spark.read.parquet(_t(sf_dir, "region"))
    disc_c4 = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier),
              (lineitem.l_suppkey == supplier.s_suppkey)
              & (customer.c_nationkey == supplier.s_nationkey))
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1999-01-01"))
        )
        .groupBy("n_name")
        .agg(
            F.sum(disc_c4).alias("revenue_c4"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def q_events_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(_t(sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.asc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("event_id", "user_id", "rn")
    )


def q_events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(_t(sf_dir, "events"))
    return (
        events.filter(
            (F.col("ts") >= F.lit("2024-01-05")) & (F.col("ts") < F.lit("2024-02-01"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(_cents("value")).alias("total_value_cents"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------

def q_doc_dup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return dedup.exact_dup_counts(docs)


_STREAM_DEDUP_SEQ = [0]


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (applyInPandasWithState) drained with
    availableNow: exactly one output row per distinct text.  The emitted
    hash SET is batching-invariant (which doc_id represents a duplicate
    group depends on micro-batch boundaries, so the query returns the
    hashes — the per-batch doc_id determinism is pytest-covered)."""
    import shutil
    import tempfile

    from geedim_spark.streaming import stateful

    # UNIQUE temp dir (two drivers on one host must not rmtree each
    # other's staged input mid-drain), removed in finally — same contract
    # as _drained_events_stream
    base = tempfile.mkdtemp(prefix="geedim_stream_dedup_")
    try:
        docs = spark.read.parquet(_t(sf_dir, "documents"))
        docs.coalesce(4).write.parquet(f"{base}/in")  # 4 files -> 2 batches

        _STREAM_DEDUP_SEQ[0] += 1
        sink = f"q_stream_dedup_sink_{_STREAM_DEDUP_SEQ[0]}"
        q = stateful.stream_dedup(spark, f"{base}/in", f"{base}/ckpt",
                                  sink_table=sink)
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming dedup did not drain within 300 s")
        out = spark.table(sink).select("text_hash").distinct()
        # materialise off the memory sink so the frame survives cleanup
        return spark.createDataFrame(out.collect(), "text_hash string")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text.token_stats(docs).select(
        "doc_id", "n_ws_tokens", "n_bpe_tokens", "n_alpha", "n_digit", "n_punct"
    )


def q_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tw(spark, sf_dir, "documents")
    sigs = dedup.minhash_sig_df(docs, n_hashes=4, n=5)
    s = F.col("sig")
    return sigs.select(
        "doc_id",
        s[0].alias("sig_0"), s[1].alias("sig_1"),
        s[2].alias("sig_2"), s[3].alias("sig_3"),
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tw(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, n_hashes=16, bands=4, n=5)


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate GROUP resolution: LSH candidate pairs -> connected
    components via iterative min-label propagation (every doc labelled by
    its cluster's minimum id; singletons label themselves).  The oracle
    resolves the same pairs with a recursive CTE — the full pipeline
    (shingle -> minhash -> bands -> bucket join -> components) value-checks
    end to end."""
    docs = _tw(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, n_hashes=16, bands=4, n=5)
    return dedup.dup_components(docs, pairs)


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    return similarity.cosine_topk(emb, n_queries=5, k=10)


ORACLE_EMB_DIM = 64  # testdata embeddings width; _lsh_bucket_sql builds
                     # plane literals at this dim, so the query asserts it


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-k with integer-quantised hyperplanes: the bucket key
    is exact int64 arithmetic (floor(x*4096) x small-int planes), so the
    whole approximate query is reproducible bit-for-bit in the SQL oracle."""
    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    dim = similarity.embedding_dim(emb)
    if dim != ORACLE_EMB_DIM:
        raise ValueError(
            f"embeddings dim {dim} != {ORACLE_EMB_DIM}: regenerate the "
            "ann_lsh oracle planes (_lsh_bucket_sql) to match"
        )
    return similarity.lsh_bucket_topk_quantised(emb, n_queries=5, k=10, n_planes=4)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (Lloyd-trained) quality gate: mean recall@10 vs the exact scan
    (value-checked `ann_topk`) must be >= 30% — random-chance overlap on
    this table is ~0.2%, so the assertion is a real index-quality check
    while staying hashable (the Lloyd centroids themselves are not
    SQL-expressible; measured recall is 56-60% at sf0.01/sf0.1)."""
    # plain read, NOT _tw: ivf_topk's centroid training uses a seeded
    # Bernoulli .sample whose draw depends on the partition split — the
    # widening repartition would change the trained index (still above
    # the gate, but not byte-stable across layouts)
    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    rec = similarity.ivf_recall_at_k(emb, n_queries=5, k=10, nlist=8, nprobe=2)
    return rec.agg(
        F.lit(10).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (F.sum("n_hits") * 100 >= F.count(F.lit(1)) * 10 * 30)
        .cast("long").alias("recall_ge_30pct"),
    )


def q_ann_ivf_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe/equi-join plan with closed-form centroids (first nlist
    vectors, round-6 cosine argmax assignment) — value-checkable twin of
    the Lloyd-trained ann_ivf."""
    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    return similarity.ivf_flat_topk(emb, n_queries=5, k=10, nlist=8, nprobe=2)


def q_embed_dup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding dedup groups: planted byte-identical copies
    (vec_id+200000) must count; the quantised-hash key is reproducible in
    SQL (floor(x*4096) is exact — power-of-two scale)."""
    emb = spark.read.parquet(_t(sf_dir, "embeddings")).select("vec_id", "embedding")
    planted = emb.filter("vec_id < 40").select(
        (F.col("vec_id") + 200000).alias("vec_id"), "embedding"
    )
    return similarity.exact_embed_dup_counts(emb.unionByName(planted))


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via LSH buckets.  Duplicates are planted
    (vec_id+100000 = 2x the vector — exact float scaling, so LSH signs and
    direction are bit-identical) and must be exactly recovered."""
    emb = _tw(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter("vec_id < 50").select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0).cast("float"))
        .alias("embedding"),
    )
    return similarity.near_dup_pairs(emb.unionByName(planted), threshold=0.99)


def q_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-payload near-dup by perceptual-hash Hamming distance
    (dedup.phash_near_dup_pairs: banded equi-join with a pigeonhole
    zero-false-negative guarantee + exact bit_count(XOR) filter).  The
    input-hint phash column is kernel-derived (codecs.phash64, not
    SQL-expressible), so the DRIVER oracle runs the operator over an
    md5-derived 60-bit surrogate hash on the documents table — identical
    band/XOR/bit_count semantics, and the brute-force SQL oracle doubles
    as a completeness proof of the pigeonhole banding; the real-phash
    path over synth images is pytest-covered (test_dedup)."""
    docs = (
        spark.read.parquet(_t(sf_dir, "documents"))
        .select("doc_id", "text").filter("doc_id < 2000")
    )
    h = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long")
    base = docs.select("doc_id", h.alias("phash"))
    planted = base.filter("doc_id < 40").select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.expr(
            "phash ^ shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 59 AS INT))"
        ).alias("phash"),
    )
    return dedup.phash_near_dup_pairs(
        base.unionByName(planted), id_col="doc_id", max_hamming=2
    )


def q_split_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 band-split transpose through the driver gate
    (collection.py:465-495 ``_split_images(SplitType.bands)``): the
    distributed per-band GeoTIFF sink writes one file per band name whose
    file-bands are that band from every image; each file is parsed back
    and its shape + pixel sum value-checked against the strip closed
    form.  S2 rows are excluded so the band set is consistent (the
    reference raises on inconsistent band sets before splitting)."""
    from geedim_spark.operators import export_ops
    from geedim_spark.sources import geotiff, sinks

    n, _ = _sizes(sf_dir)
    cap = min(n, 300)
    imgs = synth.images_df(
        spark, cap, scalar_filter="fmt = 'raw' AND i % 3 <> 2"
    )
    tiles = export_ops.export_tiles(imgs, max_tile_dim=21, max_tile_bands=1)
    out_dir = (
        f"/tmp/geedim_spark_split_bands_{synth.recipe_hash()}_{cap}"
    )
    manifest = sinks.write_image_files(
        tiles, out_dir, bands=2, h=40, w=40, split="bands",
        band_names=("B1", "QA_PIXEL"), nodata=0,
    )

    def _verify(it):
        for pdf in it:
            rows = []
            for name, path in zip(pdf["image_id"], pdf["path"]):
                arr, _meta = geotiff.read_geotiff(path)
                rows.append({
                    "band": name,
                    "n_images": int(arr.shape[0]),
                    "h": int(arr.shape[1]),
                    "w": int(arr.shape[2]),
                    "px_sum": int(arr.sum(dtype=np.int64)),
                })
            yield pd.DataFrame(
                rows, columns=["band", "n_images", "h", "w", "px_sum"]
            )

    return manifest.mapInPandas(
        _verify,
        schema="band string, n_images int, h int, w int, px_sum long",
    )


def q_best_effort_portions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 bestEffort decimation through the driver gate: images above the
    reference's regionCoverage maxPixels=1e6 cap (mask.py:78,141-144
    bestEffort=True) compute portions on a stride-decimated grid
    (masks.stats_stride).  1152x1152 strips (1.33 Mpx) force stride 2;
    the strided strip counts have an exact integer closed form (strip
    widths are even, so ceil(width/stride) == width/2).  Pixels are
    synthesized INSIDE the kernel from the row index — no 5 MB blobs
    through the plan (the landsat_param_portions pattern)."""
    n, _ = _sizes(sf_dir)
    cap = min(n, 48)
    base = spark.range(cap).select(F.col("id").cast("int").alias("i"))
    H = W = 1152

    def _batch(it):
        for pdf in it:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                v = i % 200 + 1
                f_px = (i % 5) * 4
                c_px = (i % 7) * 2
                B1 = np.full((H, W), v, np.uint16)
                B1[:, :f_px] = 0
                qa = np.zeros((H, W), np.uint16)
                if c_px:
                    qa[:, W - c_px:] = 1 << 9
                m = masks.landsat_masks({"B1": B1, "QA_PIXEL": qa})
                step = masks.stats_stride(H * W)
                sub = (slice(None, None, step), slice(None, None, step))
                rows.append({
                    "i": i, "stride": step,
                    "total_px": int(m["FILL_MASK"][sub].size),
                    "fill_px": int(m["FILL_MASK"][sub].sum()),
                    "cloudless_px": int(m["CLOUDLESS_MASK"][sub].sum()),
                })
            yield pd.DataFrame(rows, columns=[
                "i", "stride", "total_px", "fill_px", "cloudless_px",
            ])

    return base.mapInPandas(
        _batch,
        schema="i int, stride int, total_px long, fill_px long, "
               "cloudless_px long",
    )


def q_snapshot_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 snapshot machinery through the driver gate: commit the raw
    images into a partitioned snapshot table (CAS manifest swap), GC all
    but the newest manifest, read the committed snapshot back, and
    resume-check — per-collection committed row counts have a closed
    form and the resume anti-join must report zero pending keys.  The
    table dir is recipe-keyed in /tmp; repeated executions overwrite the
    same partitions and expire their predecessors, so output is stable
    run-over-run."""
    from geedim_spark.sources import snapshots

    n, _ = _sizes(sf_dir)
    cap = min(n, 400)
    imgs = synth.images_df(
        spark, cap, scalar_filter="fmt = 'raw'"
    ).select("image_id", "collection", "bytes")
    tdir = f"/tmp/geedim_spark_snapq_{synth.recipe_hash()}_{cap}"
    snapshots.write_snapshot(imgs, tdir, "collection")
    snapshots.expire_snapshots(tdir, keep_last=1)
    n_pending = snapshots.pending_keys(imgs, tdir, "collection").count()
    back = snapshots.read_snapshot(spark, tdir)
    return (
        back.groupBy("collection")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .withColumn("n_pending", F.lit(n_pending).cast("long"))
    )


def q_reproject_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export-grid reprojection (reference prepareForExport crs/
    crs_transform/shape/scale/like, image.py:741-862 ->
    operators/reproject.py): every raw image regridded to scale=2*SCALE
    with nearest resampling.  The target grid defaults to the image
    footprint, so target centres land at source position 2j+0.5 ->
    sampled pixels are exactly the odd rows/cols, giving integer
    closed-form band sums over the synthetic strip world: band 0 counts
    odd columns past the fill strip (f_px even), QA counts odd columns
    inside the cloud strip (c_px even).  Grid metadata (h, w, x-scale)
    is value-checked alongside the pixels; the bit-identical
    grid-preservation path (image.py:820-833) is pytest-covered in
    tests/test_reproject.py."""
    from geedim_spark.api import Collection
    from geedim_spark import synth as _synth

    # staged parquet: pruned blob scan -> resample kernel (see
    # q_mask_portions)
    imgs = _staged_images(spark, sf_dir).filter("fmt = 'raw'")
    coll = Collection(imgs).prepare_for_export(scale=2 * _synth.SCALE)

    def _batch(it):
        for pdf in it:
            rows = []
            for image_id, buf, h, w, tr in zip(
                pdf["image_id"], pdf["bytes"], pdf["h"], pdf["w"],
                pdf["transform"],
            ):
                px = codecs.decode(bytes(buf))
                rows.append({
                    "image_id": image_id,
                    "out_h": int(h), "out_w": int(w),
                    "xscale": float(tr[0]),
                    "b0_sum": int(px[0].sum(dtype=np.int64)),
                    "qa_sum": int(px[1].sum(dtype=np.int64)),
                })
            yield pd.DataFrame(rows, columns=[
                "image_id", "out_h", "out_w", "xscale", "b0_sum", "qa_sum",
            ])

    return coll.df.select(
        "image_id", "bytes", "h", "w", "transform"
    ).mapInPandas(
        _batch,
        schema=(
            "image_id string, out_h long, out_w long, xscale double, "
            "b0_sum long, qa_sum long"
        ),
    )


def q_numpy_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 NumPy sink through the driver gate: tiles reassemble into the
    (bands, h, w) array (export_ops.assemble_image), viewed as the
    structured per-band dtype (sinks.to_structured, image.py:1167-1175
    analog); per-band structured-field sums value-check against the strip
    closed form — S2 rows carry QA60 bit 10, others QA_PIXEL bit 9."""
    from geedim_spark.operators import export_ops
    from geedim_spark.sources import sinks

    n, _ = _sizes(sf_dir)
    cap = min(n, 240)
    imgs = synth.images_df(spark, cap, scalar_filter="fmt = 'raw'")
    tiles = export_ops.export_tiles(imgs, max_tile_dim=21, max_tile_bands=1)

    def _asm(pdf: pd.DataFrame) -> pd.DataFrame:
        iid = pdf["image_id"].iloc[0]
        arr = sinks.to_numpy(pdf.to_dict("records"), 2, 40, 40, "uint16")
        st = sinks.to_structured(arr, ["B1", "QA"])
        return pd.DataFrame([{
            "image_id": iid,
            "b1_sum": int(st["B1"].sum(dtype=np.int64)),
            "qa_sum": int(st["QA"].sum(dtype=np.int64)),
        }])

    return tiles.groupBy("image_id").applyInPandas(
        _asm, schema="image_id string, b1_sum long, qa_sum long"
    )


def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.benchmark_overlap): the
    distinct 5-gram overlap between every corpus document and a small
    benchmark set (docs with doc_id %% 499 == 0 standing in for a test
    set), per (doc, bench) pair.  Scale shape: the exploded benchmark
    n-gram set is BROADCAST; the corpus streams through one explode ->
    broadcast join -> 2-phase count aggregate — document text never
    shuffles.  The oracle recomputes the exact distinct-shingle
    intersections."""
    from geedim_spark.operators import dedup

    docs = _tw(spark, sf_dir, "documents")
    bench = docs.where("doc_id % 499 = 0").select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return dedup.benchmark_overlap(docs, bench, n=5)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing (operators/text.pack_sequences):
    documents sharded by the portable content-hash bucket, then packed
    into 512-token sequences by the contiguous-fill rule (pack =
    floor(tokens-before / 512)) under a PARTITIONED window — parallel
    per shard, bit-reproducible across engines/layout.  Per-pack
    aggregates (doc count, token sum, first doc) are the hashed
    contract; the oracle replicates the md5 shard bucket and the same
    window cumsum."""
    from geedim_spark.operators import text as text_ops

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text_ops.pack_stats(docs, max_tokens=512, n_shards=16,
                               salt="pack-v1")


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/URL redaction (operators/text.redact): deterministic planted
    contamination (an email / URL / long digit run appended per doc_id
    residue in BOTH engines) scrubbed to typed tokens; per-category
    match counts + the redacted text itself are the hashed contract.
    Patterns live in the Java-regex/RE2 common subset so the DuckDB
    twin counts identically."""
    from geedim_spark.operators import text as text_ops

    docs = _tw(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    aug = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit(" mail: user"), d, F.lit("@example.com")))
         .when(F.col("doc_id") % 5 == 1,
               F.concat(F.lit(" see https://ex.org/p/"), d))
         .when(F.col("doc_id") % 5 == 2,
               F.concat(F.lit(" acct 1234567890"), d))
         .otherwise(F.lit("")),
    )
    return text_ops.redact(docs.select("doc_id", aug.alias("text")))


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (operators/text.
    repetition_stats — the Gopher duplicated-n-gram quality rule):
    positional 10-gram duplication counts per document, 2-phase
    aggregate, integer outputs; the oracle recomputes the same
    positional-gram histogram."""
    from geedim_spark.operators import text as text_ops

    docs = _tw(spark, sf_dir, "documents")
    return text_ops.repetition_stats(docs, n=10)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash data mixing (operators/sampling.py):
    per-language keep rates over the documents table, membership a pure
    function of (doc_id, salt) — reproducible across engines and layout,
    which seeded Bernoulli sampling is not.  The oracle reproduces the
    EXACT row set (md5 is the portable hash), plus the nested-sample
    property is asserted structurally: the 20% draw is a superset of the
    10% draw at the same salt, so rows carry an in_smaller flag the SQL
    recomputes."""
    from geedim_spark.operators import sampling

    docs = spark.read.parquet(_t(sf_dir, "documents")).select(
        "doc_id", "lang"
    )
    mixed = sampling.stratified_sample(
        docs, "doc_id", "lang",
        {"en": 0.20, "de": 0.50}, default_fraction=0.05, salt="mix-v1",
    )
    smaller = sampling.stratified_sample(
        docs, "doc_id", "lang",
        {"en": 0.10, "de": 0.25}, default_fraction=0.02, salt="mix-v1",
    )
    return mixed.join(
        smaller.select("doc_id", F.lit(1).alias("_in")), "doc_id", "left"
    ).select(
        "doc_id", "lang",
        F.coalesce(F.col("_in"), F.lit(0)).cast("long").alias("in_smaller"),
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-line removal (operators/dedup.line_dedup —
    the C4/RefinedWeb line-dedup rule).  Documents are re-lined
    deterministically in BOTH engines (6-word chunks joined by newline,
    plus a planted boilerplate footer on doc_id residues 7 / 11), then
    every line occurring >= 3 times corpus-wide is dropped and the
    survivors rejoined in order.  n_lines / n_kept / the rebuilt text are
    the hashed contract — the reassembly order check is exact."""
    docs = _tw(spark, sf_dir, "documents")
    words = F.split(F.coalesce(F.col("text"), F.lit("")), F.lit(" "), F.lit(-1))
    n_chunks = F.greatest(
        F.ceil(F.size(words) / F.lit(6)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * 6 + 1, 6), " "),
    )
    body = F.array_join(chunks, "\n")
    footer = (
        F.when(F.col("doc_id") % 7 == 0,
               F.lit("\nall rights reserved - footer"))
        .when(F.col("doc_id") % 11 == 0,
              F.lit("\nclick here to subscribe"))
        .otherwise(F.lit(""))
    )
    return dedup.line_dedup(
        docs.select("doc_id", F.concat(body, footer).alias("text")),
        min_count=3,
    )


def q_wds_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar shard sink (sources/wds.py) through the driver gate:
    the synthetic image+caption corpus is written as deterministic
    content-hash tar shards (md5 bucket of image_id — the portable
    sampling.hash_bucket rule), read back via the binaryFile tar parser,
    and joined against the source.  Per shard: sample count, byte-exact
    round-trip count (must equal n_samples — the oracle's COUNT(*) twin
    only matches if every blob and caption survived the tar round trip),
    and a caption checksum.  The tar dir is recipe-keyed in /tmp and
    overwritten per run, so output is stable run-over-run."""
    from geedim_spark.sources import wds

    n, _ = _sizes(sf_dir)
    cap = min(n, 400)
    imgs = _staged_images(spark, sf_dir).filter(f"i < {cap}").select(
        "image_id", "bytes", "caption", "w", "h", "fmt"
    )
    out = f"/tmp/geedim_spark_wdsq_{synth.recipe_hash()}_{cap}"
    wds.write_wds_shards(imgs, out, n_shards=8, overwrite=True)
    back = wds.read_wds_shards(spark, out).select(
        "shard",
        F.regexp_replace("key", "_", "/").alias("image_id"),
        "data",
        F.col("caption").alias("rt_caption"),
    )
    j = back.join(imgs, "image_id")
    return j.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum(
            ((F.col("data") == F.col("bytes"))
             & (F.col("rt_caption") == F.col("caption"))).cast("long")
        ).cast("long").alias("n_byte_exact"),
        F.sum(F.substring(F.col("caption"), -3, 3).cast("long"))
        .cast("long").alias("caption_ck"),
    )


def q_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing (operators/multimodal.aspect_bucket — the
    SDXL multi-aspect batching rule) over deterministic per-doc image
    dims: every row's bucket assignment and ViT-token cost is checked
    exactly.  The argmin is integer cross-multiplication in BOTH engines
    (Spark aggregate fold vs DuckDB list_reduce), so there is no float
    in the decision path and the per-row contract hashes bit-for-bit."""
    from geedim_spark.operators import multimodal

    docs = _tw(spark, sf_dir, "documents").select(
        "doc_id",
        (256 + (F.col("doc_id") * 37) % 769).cast("int").alias("w"),
        (256 + (F.col("doc_id") * 53) % 769).cast("int").alias("h"),
    )
    return multimodal.aspect_bucket(docs).select(
        "doc_id", "w", "h", "bucket_idx", "bucket_w", "bucket_h",
        "n_vit_tokens",
    )


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (text.top_ngrams): top-50 character trigrams by
    DOCUMENT frequency with the deterministic (count desc, ngram) order —
    the SQL twin regenerates the same distinct-shingle sets, so the
    whole ranking value-checks exactly."""
    from geedim_spark.operators import text as text_ops

    docs = _tw(spark, sf_dir, "documents").select("text")
    return text_ops.top_ngrams(docs, n=3, k=50)


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText document-quality rule verdicts (operators/text.
    gopher_rules, Rae et al. 2021 appendix A1.1): one boolean per rule +
    the conjunction, all pure Catalyst expressions — zero shuffle, one
    projection pass.  min_words/min_stop_words tuned down so the
    synthetic word-soup corpus exercises both outcomes of every rule the
    data can flip."""
    from geedim_spark.operators import text as text_ops

    docs = _tw(spark, sf_dir, "documents")
    return text_ops.gopher_rules(docs, min_words=40, min_stop_words=1)


def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY exact dedup (operators/dedup.apply_exact): the deduplicated
    corpus membership — canonical min-doc_id survivor + copy count per
    exact text group, as a pure 2-phase hash aggregate (no window, no
    join).  Complements doc_dup_counts (which measures, per doc)."""
    from geedim_spark.operators import dedup as dedup_ops

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return dedup_ops.apply_exact(docs)


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-seeded training order (operators/sampling.
    epoch_shuffle): (shard, epoch_rank) is a pseudorandom permutation
    that is a pure function of (doc_id, epoch, salt) — reproducible
    across layout/engines, NO global sort (rank windows are partitioned
    by the content-hash shard).  The oracle replays the identical md5
    derivation and per-shard ranking."""
    from geedim_spark.operators import sampling

    docs = spark.read.parquet(_t(sf_dir, "documents")).select("doc_id")
    return sampling.epoch_shuffle(docs, "doc_id", epoch=3, n_shards=8)


def q_near_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full fuzzy-dedup chain APPLIED: shingle -> minhash -> LSH
    bucket join -> connected components -> survivor membership
    (operators/dedup.apply_components).  The oracle resolves the same
    pipeline with a recursive CTE and keeps rows whose component label
    is their own id."""
    from geedim_spark.operators import dedup as dedup_ops

    docs = _tw(spark, sf_dir, "documents")
    pairs = dedup_ops.minhash_lsh_pairs(docs, n_hashes=16, bands=4, n=5)
    comps = dedup_ops.dup_components(docs, pairs)
    return dedup_ops.apply_components(docs, comps).select(
        "doc_id", "lang", "n_chars")


def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus unigram-LM quality signal (operators/text.token_rarity,
    the CCNet perplexity-filter analogue): per-doc token-frequency mass
    (exact BIGINT) + average negative log-likelihood under the corpus
    unigram distribution.  Explode -> two 2-phase aggs -> token-key
    equi-join; the oracle replays the identical counts and ln() sums."""
    from geedim_spark.operators import text as text_ops

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text_ops.token_rarity(docs)


def q_cdc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-SPAN detection via content-defined
    chunking (operators/dedup.cdc_dup_spans): Rabin-style boundaries
    make identical long spans chunk identically at any alignment — the
    linear-pass answer to the suffix-array ExactSubstr problem (Lee et
    al. 2022).  modulus=16 targets ~24-char chunks for this corpus's
    ~300-char docs.  The oracle replays the identical polynomial window
    hash, boundary rule, and chunk accounting in SQL."""
    from geedim_spark.operators import dedup as dedup_ops

    docs = _tw(spark, sf_dir, "documents")
    return dedup_ops.cdc_dup_spans(docs, w=8, modulus=16)


def q_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-noise detection (operators/similarity.knn_label_noise):
    each vector's label vs the majority label of its 5 nearest
    LSH-bucket neighbours — the Confident-Learning curation signal.
    Integer-quantised buckets + round(cos,6) ranking keep the whole
    query bit-reproducible in the SQL oracle."""
    emb = _tw(spark, sf_dir, "embeddings")
    dim = similarity.embedding_dim(emb)
    if dim != ORACLE_EMB_DIM:
        raise ValueError(
            f"embeddings dim {dim} != {ORACLE_EMB_DIM}: regenerate the "
            "label_noise oracle planes (_lsh_bucket_sql) to match"
        )
    return similarity.knn_label_noise(emb, k=5, n_planes=4)


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/text.dsir_weights, Xie et al.
    2023): hashed unigram+bigram bucket models (portable md5 bucket,
    add-1 smoothing) for target (lang='en') vs raw, per-doc log-ratio
    score.  The oracle replays the full model fit in DuckDB."""
    from geedim_spark.operators import text as text_ops

    docs = _tw(spark, sf_dir, "documents")
    return text_ops.dsir_weights(
        docs, F.col("lang") == "en", n_buckets=256, alpha=1.0
    )


def q_stream_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash-LSH near-dup (streaming/neardup.py): banded
    signatures as keyed bucket STATE across micro-batches; the drained
    availableNow emissions, counted per pair, must equal the batch LSH
    join — the oracle IS the batch minhash_lsh_pairs SQL (same params,
    cap never hit at these scales)."""
    import shutil
    import tempfile

    from geedim_spark.streaming import neardup as snd

    base = tempfile.mkdtemp(prefix="geedim_stream_nd_")
    _STREAM_Q_SEQ[0] += 1
    sink = f"q_stream_nd_sink_{_STREAM_Q_SEQ[0]}"
    try:
        docs = spark.read.parquet(_t(sf_dir, "documents"))
        docs.coalesce(4).write.parquet(f"{base}/in")  # 4 files -> 2 batches
        q = snd.stream_near_dup(
            spark, f"{base}/in", f"{base}/ckpt",
            n_hashes=16, bands=4, n=5, sink_table=sink,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream did not drain within 300 s")
        agg = (
            spark.table(sink)
            .groupBy("doc_id_a", "doc_id_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
        )
        return spark.createDataFrame(
            agg.collect(),
            "doc_id_a long, doc_id_b long, n_shared_bands long",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_composite_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month median composites (composite.composite_by_period):
    the synthetic epoch advances 1 h per image, so months partition the
    MOCK family at exactly-known boundaries; per-(month, column) medians
    have the same closed form as composite_profile, grouped by month."""
    import math

    n, _ = _sizes(sf_dir)
    imgs = _staged_images(spark, sf_dir).filter(
        "i % 3 = 0 AND fmt = 'raw' AND i < 900"
    )
    comp = composite.composite_by_period(imgs, period="month",
                                         method="median")

    def _profile(it):
        for pdf in it:
            rows = []
            for gid, buf in zip(pdf["group_id"], pdf["bytes"]):
                px = codecs.decode(bytes(buf))
                for xl in range(px.shape[2]):
                    v = float(px[0, 0, xl])
                    if math.isnan(v):
                        continue
                    rows.append({"period": gid, "x": xl, "median_v": v})
            yield pd.DataFrame(rows, columns=["period", "x", "median_v"])

    return comp.mapInPandas(
        _profile, schema="period string, x int, median_v double"
    )


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (streaming/joins.py): views
    joined to same-user purchases within 1 hour, drained with
    availableNow — must equal the batch interval join (the DuckDB
    oracle).  Delays are compared in exact integer microseconds."""
    from geedim_spark.streaming import joins as sj

    return _drained_events_stream(
        spark, sf_dir,
        lambda src, ckpt, sink: sj.stream_event_join(
            spark, src, ckpt, left_type="view", right_type="purchase",
            within="1 hour", watermark="90 days", sink_table=sink,
        ),
        lambda t: t.select(
            "user_id",
            (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("d"),
        ).groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("d").cast("long").alias("sum_delay_us"),
            F.max("d").cast("long").alias("max_delay_us"),
        ),
        "user_id long, n_pairs long, sum_delay_us long, max_delay_us long",
    )


def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-length quantiles (operators/text.length_quantiles):
    2-phase histogram agg, window only over the bounded value domain,
    integer-permille thresholds (no float in the cut rule)."""
    from geedim_spark.operators import text as text_ops

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text_ops.length_quantiles(
        docs, permille=(100, 250, 500, 750, 900, 990, 1000)
    )


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics (operators/zonal.zonal_stats): per-(image, zone)
    count/sum/min/max/mean of band 0 over pixel centres inside each zone
    polygon, fill-gated.  Zones are the ROI rectangles shifted +0.5 m so
    no pixel centre ever lies on a zone edge — the SQL oracle replays
    the centre-grid arithmetic as an exact integer closed form."""
    from geedim_spark.operators import zonal

    n, m = _sizes(sf_dir)
    imgs = _staged_images(spark, sf_dir).filter(
        f"fmt = 'raw' AND i < {min(n, 900)}")
    half = F.lit(0.5)
    zones = synth.rois_df(spark, m).select(
        F.col("roi_id").alias("zone_id"),
        F.array(
            F.array(F.col("rx0") + half, F.col("ry0") + half),
            F.array(F.col("rx1") + half, F.col("ry0") + half),
            F.array(F.col("rx1") + half, F.col("ry1") + half),
            F.array(F.col("rx0") + half, F.col("ry1") + half),
        ).alias("poly"),
    )
    return zonal.zonal_stats(imgs, zones, band=0, nodata=0.0)


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health table (operators/text.domain_stats):
    RefinedWeb-style per-domain counts / size / exact-dup ratio /
    language spread.  Dup counting shuffles md5(text), never the text."""
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text.domain_stats(docs)


def q_revisit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-grid-cell revisit gaps (operators/collection_ops.revisit_stats):
    exact integer cell keys + integer-second gaps; the only window is
    PARTITIONED BY the cell."""
    n, _ = _sizes(sf_dir)
    images = synth.images_meta_df(spark, n)
    return collection_ops.revisit_stats(images, cell_size=10000.0)


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (operators/similarity.
    hard_negatives): top-3 most-similar OTHER-label vectors per vector
    from the quantised LSH buckets; round(cos,6) + id tiebreaks keep the
    ranking reproducible cross-engine."""
    emb = _tw(spark, sf_dir, "embeddings")
    return similarity.hard_negatives(emb, k=3, n_planes=4)


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc tf-idf keywords (operators/text.tfidf_top_terms): ranking
    on exact integer keys (tf DESC, df ASC, term ASC); the rounded float
    score is informational only."""
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text.tfidf_top_terms(docs, k=3)


def q_image_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style metadata admission gate (operators/multimodal.
    quality_gate) over the synthetic image+caption table with derived
    varied dims (the synth table is constant 40x40, so the gate query
    derives per-row test dims from ``i`` — replayed identically in the
    oracle); funnel counts per format."""
    n, _ = _sizes(sf_dir)
    imgs = synth.images_meta_df(spark, n).select(
        "fmt", "caption",
        (F.lit(16) + F.col("i") % 48).cast("long").alias("w"),
        (F.lit(16) + (F.col("i") * 7) % 48).cast("long").alias("h"),
    )
    g = multimodal.quality_gate(
        imgs, min_dim=24, max_aspect=(2, 1), min_caption_chars=5,
        fmts=("raw",))
    flag = lambda c: F.sum(F.col(c).cast("long")).cast("long")  # noqa: E731
    return g.groupBy("fmt").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        flag("ok_dim").alias("n_ok_dim"),
        flag("ok_aspect").alias("n_ok_aspect"),
        flag("ok_caption").alias("n_ok_caption"),
        flag("ok_fmt").alias("n_ok_fmt"),
        flag("keep").alias("n_keep"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.asof_join): every purchase matched to
    the user's most recent at-or-before view — the nearest-predecessor
    time-series alignment DuckDB runs natively as ASOF JOIN and Spark
    gets from the one-shuffle tag/union/keyed-running-last plan.  Right
    side deduped to one row per (user, ts) via max(event_id) so the
    match is deterministic in both engines; delays in exact integer
    microseconds."""
    from geedim_spark.operators import asof

    # parquet ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the
    # session tz is pinned UTC (session.py) so the cast is value-exact
    ev = spark.read.parquet(_t(sf_dir, "events")).withColumn(
        "ts", F.col("ts").cast("timestamp"))
    views = (
        ev.filter("event_type = 'view'")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").cast("long").alias("view_id"))
    )
    purch = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts")
    j = asof.asof_join(purch, views, on="ts", by=("user_id",),
                       payload=("view_id",))
    return j.select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("ts_right").alias("view_ts_us"),
        F.col("view_id_right").alias("view_id"),
        (F.unix_micros("ts") - F.unix_micros("ts_right")).alias("delay_us"),
    )


def q_image_exact_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multimodal dedup — the LAION 'same image, different
    alt-text' rule: group by md5 of the ENCODED PIXEL BYTES, count
    images and distinct captions per content group.  The Spark side
    hashes real bytes (shuffle key = 32-char md5, never the blob); the
    oracle regenerates the SAME partition analytically — pixels are a
    pure function of (v, f_px, c_px, w, h, fmt, qa-bit kind), all
    available in the synth SQL twin — so a value match proves the
    byte-level hash path groups exactly like the recipe says it must."""
    imgs = _staged_images(spark, sf_dir)
    keyed = imgs.select(
        F.md5(F.col("bytes")).alias("content_key"), "caption", "image_id")
    return keyed.groupBy("content_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.countDistinct("caption").cast("long").alias("n_captions"),
        F.min("image_id").alias("rep_image_id"),
    ).select("n_images", "n_captions", "rep_image_id")


def q_roi_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ROI temporal coverage completeness: months with >= 1
    intersecting acquisition vs the collection's total month span —
    the 'is this AOI's time series usable' planning table.  Pairs come
    from the cell-cover join + exact bbox refine (operators/
    spatial_join.filter_bounds, ROIs broadcast); months via date_trunc;
    coverage as exact integer permille (no float in the ratio)."""
    n, m = _sizes(sf_dir)
    images = synth.images_meta_df(spark, n)
    rois = synth.rois_df(spark, m)
    pairs = sj.filter_bounds(images, rois)
    dated = pairs.join(
        images.select("image_id",
                      F.date_trunc("month", "time_start").alias("month")),
        "image_id")
    total = images.agg(F.countDistinct(
        F.date_trunc("month", "time_start")).cast("long").alias("total_months"))
    per = dated.groupBy("roi_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.countDistinct("month").cast("long").alias("n_months"),
    )
    return per.crossJoin(F.broadcast(total)).select(
        "roi_id", "n_images", "n_months", "total_months",
        F.expr("CAST(n_months * 1000 DIV total_months AS BIGINT)")
        .alias("coverage_permille"),
    )


def q_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile quality pruning (operators/text.quality_prune): keep
    the top 400‰ per language by exact integer alpha-permille; the cut
    comes from the bounded-domain histogram (the corpus never sorts),
    ties at the cut kept."""
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text.quality_prune(docs, permille=400)


def q_fuzzy_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup benchmark decontamination (operators/dedup.
    fuzzy_decontam): MinHash-LSH candidates BETWEEN corpus and a
    planted benchmark (every 50th doc with its last 3 chars cut — a
    light edit exact n-gram decontam would miss), verified with exact
    shingle Jaccard; the verdict is integer cross-multiplied."""
    docs = _tw(spark, sf_dir, "documents")
    bench = docs.filter("doc_id % 50 = 0").select(
        (F.col("doc_id") + 900000).alias("bench_id"),
        F.expr("substr(text, 1, greatest(length(text) - 3, 1))")
        .alias("text"),
    )
    return dedup.fuzzy_decontam(docs, bench, threshold_permille=500)


def q_quantize_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization (operators/similarity.quantize_int8
    + _stats): exact IEEE floor(x*127/max_abs) per component — the
    oracle replays every step; outputs are the hashable per-vector
    summary (the driver canonicalizer cannot hash array columns)."""
    emb = _tw(spark, sf_dir, "embeddings")
    return similarity.quantize_int8_stats(emb)


def q_phash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup CLUSTERS: the phash banded-Hamming pairs resolved
    into connected components (min-label + pointer-jump propagation) —
    keep/drop decisions act on clusters, not edges.  Same surrogate-hash
    construction as ``phash_near_dup`` (see that docstring); the oracle
    resolves the identical brute-force pair graph with a recursive CTE."""
    docs = (
        spark.read.parquet(_t(sf_dir, "documents"))
        .select("doc_id", "text").filter("doc_id < 2000")
    )
    h = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long")
    base = docs.select("doc_id", h.alias("phash"))
    planted = base.filter("doc_id < 40").select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.expr(
            "phash ^ shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 59 AS INT))"
        ).alias("phash"),
    )
    allr = base.unionByName(planted)
    pairs = dedup.phash_near_dup_pairs(
        allr, id_col="doc_id", max_hamming=2
    ).select("doc_id_a", "doc_id_b")
    return dedup.dup_components(allr.select("doc_id"), pairs)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping chunking (operators/text.chunk_documents,
    the RAG splitter): size 200 / overlap 50 character chunks with exact
    start arithmetic; the oracle replays the ceil/stride math and every
    substring."""
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return text.chunk_documents(docs, size=200, overlap=50)


def q_nearest_roi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-ROI assignment (operators/spatial_join.nearest_roi):
    every image to its closest ROI by footprint-centre distance —
    bounded dim collect folded as a constant array, struct-min argmin
    with roi_id tiebreak, zero shuffle.  The oracle replays the same
    centre/d² doubles with a cross join + rank."""
    n, m = _sizes(sf_dir)
    images = synth.images_meta_df(spark, n)
    rois = synth.rois_df(spark, m)
    return sj.nearest_roi(images, rois)


def q_band_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image pixel-value frequency histogram of band 0
    (operators/export_ops.pixel_histogram — the frequencyHistogram
    region reduce): the Arrow kernel np.unique's REAL decoded pixels;
    the oracle is the strip world's closed form (value 0 x f_px*h fill
    columns, value v x (w-f_px)*h)."""
    imgs = _staged_images(spark, sf_dir).filter("fmt = 'raw'")
    return export_ops.pixel_histogram(imgs, band=0)


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events table: users grouped by
    their FIRST event's ISO week, counted in every later week they were
    active — the classic activation/retention matrix.  Week offsets are
    exact integer arithmetic on epoch seconds (both engines truncate
    weeks to ISO Monday)."""
    ev = spark.read.parquet(_t(sf_dir, "events")).select(
        "user_id", F.date_trunc("week", F.col("ts").cast("timestamp"))
        .alias("week"))
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.select("user_id", "week").distinct()
    j = active.join(first, "user_id")
    return (
        j.groupBy("cohort_week",
                  ((F.unix_timestamp("week")
                    - F.unix_timestamp("cohort_week"))
                   / F.lit(604800)).cast("long").alias("week_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .select(F.unix_timestamp("cohort_week").alias("cohort_week_s"),
                "week_offset", "n_users")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordered registry.  The driver's CORRECTNESS gate checks the FIRST
    ``PRIORITY_WINDOW`` entries, so the prefix is curated to hold at least
    one oracle per operator family (see COVERAGE.md); redundant in-family
    variants sit below the line and stay covered by pytest +
    scripts/check_oracles.py.  tests/test_properties.py guards the
    prefix-covers-every-family invariant against future growth.
    """
    return {
        # --- priority prefix: one oracle per operator family -------------
        # Round-5 rotation (COVERAGE.md schedule): 9 swaps (IN <- OUT),
        # every swap keeping >= 1 oracle per family in the prefix
        # (guarded by test_priority_prefix_covers_every_family):
        #   best_effort_portions <- tiled_portions   (mask-stats keeps
        #                                             landsat_param_portions)
        #   split_bands <- export_tiles              (export keeps
        #                                             prepare_export)
        #   string_fns <- search                     (search family)
        #   top_ngrams <- sort_date_dist             (sort keeps
        #                                             sort_portion)
        #   streaming_sessions <- session_windows    (sessionisation)
        #   shipping_priority <- top_customers       (relational)
        #   phash_near_dup <- simhash                (dedup-simhash)
        #   stratified_sample <- ngram_jaccard       (dedup-minhash keeps
        #                                             minhash_lsh_pairs)
        #   snapshot_commit <- streaming_ingest      (streaming-ingest)
        # The five r4-new capabilities (phash_near_dup, split_bands,
        # best_effort_portions, snapshot_commit, stratified_sample) and
        # top_ngrams get their first driver-green row this round; the OUT
        # set was driver-green in r4 and stays check_oracles + pytest
        # covered.  r6 plan: numpy_roundtrip <- prepare_export,
        # local_supplier_volume <- shipping_priority, search returns,
        # limit_sorted <- string_fns.
        "spatial_join": q_spatial_join,
        "reproject_export": q_reproject_export,  # NEW r5 capability
        "skew_join": q_skew_join,
        "asof_join": q_asof_join,                        # NEW r5, in-window
        # (best_effort_portions moved below the line r5-late: mask-stats
        # keeps landsat_param_portions in-window; it was driver-green r4)
        "landsat_param_portions": q_landsat_param_portions,
        "mask_clouds": q_mask_clouds,
        "mask_polygons": q_mask_polygons,
        "s2_qa_portions": q_s2_qa_portions,
        "s2_score_thresh": q_s2_score_thresh,
        "s2_prob_join": q_s2_prob_join,
        "s2_shadow_params": q_s2_shadow_params,  # NEW r5 capability
        "cdi_join": q_cdi_join,
        "morphology": q_morphology,
        "cloud_dist": q_cloud_dist,
        "halo_edt": q_halo_edt,
        "tile_grid": q_tile_grid,
        "split_bands": q_split_bands,
        "resample": q_resample,
        "geotiff_roundtrip": q_geotiff_roundtrip,
        "band_props": q_band_props,
        "band_select": q_band_select,
        "string_fns": q_string_fns,
        "date_filter_1ms": q_date_filter_1ms,
        "union_compat": q_union_compat,
        "sort_portion": q_sort_portion,
        "top_ngrams": q_top_ngrams,
        "collection_minmax": q_collection_minmax,
        "composite_tiled_profile": q_composite_tiled_profile,
        "medoid_profile": q_medoid_profile,
        "composite_tiled_qmosaic": q_composite_tiled_qmosaic,
        "dct8_psnr": q_dct8_psnr,
        "snapshot_commit": q_snapshot_commit,
        "streaming_windows": q_streaming_windows,
        "streaming_dedup": q_streaming_dedup,
        "streaming_sessions": q_streaming_sessions,
        "events_recent": q_events_recent,
        "shipping_priority": q_shipping_priority,
        "doc_quality": q_doc_quality,
        "pack_sequences": q_pack_sequences,      # NEW r5 capability
        "decontam": q_decontam,                  # NEW r5 capability
        "lang_id": q_lang_id,
        "doc_dup_counts": q_doc_dup_counts,
        "phash_near_dup": q_phash_near_dup,
        "stratified_sample": q_stratified_sample,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "dedup_components": q_dedup_components,
        "ann_topk": q_ann_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf_flat": q_ann_ivf_flat,
        "embed_dup_counts": q_embed_dup_counts,
        # --- below the driver's 50-query window: in-family variants ------
        "best_effort_portions": q_best_effort_portions,  # driver-green r4
        # (driver-green in a previous round — r5 OUT set first; still
        # pytest + check_oracles covered every session)
        "geo_spatial_join": q_geo_spatial_join,
        "tiled_portions": q_tiled_portions,
        "export_tiles": q_export_tiles,
        "search": q_search,
        "sort_date_dist": q_sort_date_dist,
        "doc_token_stats": q_doc_token_stats,
        "doc_fingerprint": q_doc_fingerprint,
        "prepare_export": q_prepare_export,
        "session_windows": q_session_windows,
        "top_customers": q_top_customers,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "streaming_ingest": q_streaming_ingest,
        "embed_near_dup": q_embed_near_dup,
        "ann_ivf": q_ann_ivf,  # recall-vs-exact quality gate (hashable)
        "mask_portions": q_mask_portions,
        "composite_profile": q_composite_profile,
        "qmosaic_halo": q_qmosaic_halo,
        "s2_score_join": q_s2_score_join,
        "image_features": q_image_features,
        "minhash_sig": q_minhash_sig,
        "events_sessions": q_events_sessions,
        "events_type_stats": q_events_type_stats,
        "pricing_summary": q_pricing_summary,
        "local_supplier_volume": q_local_supplier_volume,
        "limit_sorted": q_limit_sorted,
        "numpy_roundtrip": q_numpy_roundtrip,            # K2; windows r6
        "streaming_score_join": q_streaming_score_join,  # NEW r5; windows r6
        "pii_redact": q_pii_redact,                      # NEW r5; windows r6
        "repetition_stats": q_repetition_stats,          # NEW r5; windows r6
        "line_dedup": q_line_dedup,                      # NEW r5; windows r6
        "wds_shards": q_wds_shards,                      # NEW r5; windows r6
        "aspect_bucket": q_aspect_bucket,                # NEW r5; windows r6
        "gopher_rules": q_gopher_rules,                  # NEW r5; windows r6
        "dedup_apply": q_dedup_apply,                    # NEW r5; windows r6
        "epoch_shuffle": q_epoch_shuffle,                # NEW r5; windows r6
        "near_dedup_apply": q_near_dedup_apply,          # NEW r5; windows r6
        "token_rarity": q_token_rarity,                  # NEW r5; windows r6
        "cdc_dup_spans": q_cdc_dup_spans,                # NEW r5; windows r6
        "label_noise": q_label_noise,                    # NEW r5; windows r6
        "dsir_weights": q_dsir_weights,                  # NEW r5; windows r6
        "zonal_stats": q_zonal_stats,                    # NEW r5; windows r6
        "length_quantiles": q_length_quantiles,          # NEW r5; windows r6
        "stream_stream_join": q_stream_stream_join,      # NEW r5; windows r6
        "composite_monthly": q_composite_monthly,        # NEW r5; windows r6
        "stream_near_dup": q_stream_near_dup,            # NEW r5; windows r6
        "domain_stats": q_domain_stats,                  # NEW r5; windows r6
        "revisit_stats": q_revisit_stats,                # NEW r5; windows r6
        "hard_negatives": q_hard_negatives,              # NEW r5; windows r6
        "tfidf_terms": q_tfidf_terms,                    # NEW r5; windows r6
        "image_gate": q_image_gate,                      # NEW r5; windows r6
        "image_exact_dup": q_image_exact_dup,            # NEW r5; windows r6
        "roi_coverage": q_roi_coverage,                  # NEW r5; windows r6
        "quality_prune": q_quality_prune,                # NEW r5; windows r6
        "fuzzy_decontam": q_fuzzy_decontam,              # NEW r5; windows r6
        "quantize_embed": q_quantize_embed,              # NEW r5; windows r6
        "phash_components": q_phash_components,          # NEW r5; windows r6
        "chunk_documents": q_chunk_documents,            # NEW r5; windows r6
        "nearest_roi": q_nearest_roi,                    # NEW r5; windows r6
        "band_histogram": q_band_histogram,              # NEW r5; windows r6
        "cohort_retention": q_cohort_retention,          # NEW r5; windows r6
    }


# The driver's CORRECTNESS gate checks the first PRIORITY_WINDOW queries()
# entries; the prefix must hold >= 1 oracle per operator family.  The family
# map is the machine-checkable form of COVERAGE.md and is guarded by
# tests/test_properties.py::test_priority_prefix_covers_every_family.
PRIORITY_WINDOW = 50

QUERY_FAMILIES: dict[str, tuple[str, ...]] = {
    "spatial-join": ("spatial_join", "geo_spatial_join", "roi_coverage",
                     "nearest_roi"),
    "skew-join": ("skew_join",),
    "mask-stats": ("mask_portions", "tiled_portions",
                   "landsat_param_portions", "best_effort_portions",
                   "band_histogram"),
    "mask-apply": ("mask_clouds",),
    "geometry": ("mask_polygons", "zonal_stats"),
    "s2-qa": ("s2_qa_portions",),
    "s2-score": ("s2_score_join", "s2_score_thresh"),
    "s2-prob": ("s2_prob_join",),
    "s2-shadow": ("s2_shadow_params",),
    "cdi": ("cdi_join",),
    "morphology": ("morphology",),
    "cloud-dist": ("cloud_dist",),
    "stencil": ("halo_edt",),
    "tiler": ("tile_grid",),
    "export": ("export_tiles", "prepare_export", "split_bands",
               "numpy_roundtrip", "wds_shards"),
    "resample": ("resample",),
    "reproject": ("reproject_export",),
    "geotiff": ("geotiff_roundtrip",),
    "band-props": ("band_props",),
    "band-select": ("band_select",),
    # search exercises the schema registry incl. abbreviation expansion and
    # safe-name mapping; string_fns is the same schema-string family
    "search": ("search", "string_fns", "limit_sorted"),
    "date-filter": ("date_filter_1ms",),
    "union": ("union_compat",),
    "sort": ("sort_portion", "sort_date_dist"),
    "collection-agg": ("collection_minmax", "revisit_stats"),
    "composite": ("composite_profile", "composite_tiled_profile",
                  "composite_monthly"),
    "medoid": ("medoid_profile",),
    "qmosaic": ("qmosaic_halo", "composite_tiled_qmosaic"),
    "multimodal": ("image_features", "dct8_psnr", "aspect_bucket",
                   "image_gate"),
    "streaming-ingest": ("streaming_ingest", "snapshot_commit",
                         "streaming_score_join", "stream_stream_join"),
    "streaming-windows": ("streaming_windows",),
    "streaming-dedup": ("streaming_dedup", "stream_near_dup"),
    "sessionisation": ("events_sessions", "session_windows",
                       "streaming_sessions"),
    "events-agg": ("events_type_stats", "events_recent",
                   "cohort_retention"),
    "asof-join": ("asof_join",),
    "relational": ("pricing_summary", "top_customers", "shipping_priority",
                   "local_supplier_volume"),
    "text-quality": ("doc_quality", "pii_redact", "repetition_stats",
                     "gopher_rules", "domain_stats", "quality_prune"),
    "text-tokens": ("doc_token_stats", "top_ngrams", "token_rarity",
                    "length_quantiles", "tfidf_terms"),
    "decontam": ("decontam", "fuzzy_decontam"),
    "packing": ("pack_sequences", "chunk_documents"),
    "text-langid": ("lang_id",),
    # content-hash sampling shares the portable-md5-derivation machinery
    # with the fingerprint ops; doc_fingerprint anchors the family in-window
    "text-fingerprint": ("doc_fingerprint", "stratified_sample",
                         "epoch_shuffle", "dsir_weights"),
    "dedup-exact": ("doc_dup_counts", "line_dedup", "dedup_apply",
                    "cdc_dup_spans", "image_exact_dup"),
    "dedup-simhash": ("simhash", "phash_near_dup"),  # bit-fingerprint
                                                     # hamming dedup
    "dedup-minhash": ("minhash_sig", "minhash_lsh_pairs", "ngram_jaccard"),
    "dedup-components": ("dedup_components", "near_dedup_apply",
                         "phash_components"),
    "ann-exact": ("ann_topk",),
    "ann-lsh": ("ann_lsh", "label_noise", "hard_negatives"),
    "ann-ivf": ("ann_ivf", "ann_ivf_flat"),
    "embed-dedup": ("embed_near_dup", "embed_dup_counts",
                    "quantize_embed"),
}


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _ducksizes(sf: float) -> tuple[int, int]:
    return synth.n_images_for_sf(sf), synth.n_rois_for_sf(sf)


def _lsh_bucket_sql(dim: int = ORACLE_EMB_DIM, n_planes: int = 4) -> str:
    """SQL twin of similarity.lsh_bucket_quantised: same seeded integer
    planes, exact int64 dot products, same sign->bit packing."""
    planes = similarity.lsh_int_planes(dim, n_planes)
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(str(int(v)) for v in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(qv, {lit}) > 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


_SESSION_ORACLE = """
            -- NOTE >= 1800 (not >): a session window spans [t, t+gap); an
            -- event at exactly t+gap starts a NEW session in Spark's
            -- native session_window (merge condition is next < prev_end)
            WITH marked AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id) >= 1800
                          OR lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                          THEN 1 ELSE 0 END AS ns
              FROM events),
            sess AS (
              -- the cumsum MUST share the marked CTE's (ts, event_id)
              -- tiebreak: ordering by ts alone is nondeterministic when a
              -- user has two events at one timestamp straddling a session
              -- boundary
              SELECT user_id, ts,
                     SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sidx
              FROM marked)
            SELECT user_id, MIN(ts) AS session_start,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM sess GROUP BY user_id, sidx
        """


def oracle_sql(sf: float = 0.01) -> dict[str, str]:
    n, m = _ducksizes(sf)
    images = synth.sql_images(n)
    rois = synth.sql_rois(m)

    mock = "collection = 'MOCK/CONST'"

    def _keys_w(t: str) -> str:
        """Keys a=-0.5 bicubic kernel on |t| (resample._cubic_kernel);
        every tap |t| here is a non-integer dyadic quarter, so the
        polynomial evaluates exactly in both engines."""
        return (
            f"(CASE WHEN {t} <= 1 THEN 1.5*{t}*{t}*{t} - 2.5*{t}*{t} + 1 "
            f"WHEN {t} < 2 THEN -0.5*{t}*{t}*{t} + 2.5*{t}*{t} - 4*{t} + 2 "
            f"ELSE 0 END)"
        )

    def _bicubic_val() -> str:
        """Per-output-column bicubic value for the 2x upsample of the
        band-0 strip row: 4 clipped taps, weight-normalised like
        resample.resample_bicubic."""
        base = "CAST(floor(0.5 * x - 0.25) AS BIGINT)"
        num, den = [], []
        for k in (-1, 0, 1, 2):
            t = f"abs((0.5 * x - 0.25) - ({base} + {k}))"
            w = _keys_w(t)
            idx = f"LEAST(GREATEST({base} + {k}, 0), w - 1)"
            num.append(f"{w} * (CASE WHEN {idx} >= f_px THEN v ELSE 0 END)")
            den.append(w)
        return f"(({' + '.join(num)}) / ({' + '.join(den)}))"
    s2 = "collection = 'COPERNICUS/S2_SR_HARMONIZED'"
    # QA60 validity window (mask.py:379-385): populated strictly OUTSIDE
    # [2022-02-01, 2024-02-01]; the synthetic epoch starts 2024-01-01 so
    # only the upper bound matters
    qa_ok = "time_start > TIMESTAMP '2024-02-01'"
    # effective S2 combined-cloud width after the qa pipeline's open(20 m =
    # 2 px) + dilate(50 m = 5 px) morphology (mask.py:466-472): a full-height
    # right strip of width c erodes to c-2 (empty for c <= 2) then dilates
    # to c+3; zero when QA60 is in its unpopulated window
    s2_ceff = (
        f"CASE WHEN ({qa_ok}) AND c_px > 2 THEN c_px + 3 ELSE 0 END"
    )
    # cloudless strip width per mask family.  S2 rows inside the QA60
    # unpopulated window report ZERO cloudless pixels: the reference masks
    # the QA band there, the mask propagates to CLOUDLESS, and
    # regionCoverage unmask()-s to 0 (mask.py:374-391 + image.py:641) —
    # unverifiable images must never rank as perfectly clear
    clw = (
        f"CASE WHEN {mock} THEN w - f_px "
        f"WHEN {s2} AND NOT ({qa_ok}) THEN 0 "
        f"WHEN {s2} THEN w - f_px - ({s2_ceff}) "
        f"ELSE w - f_px - c_px END"
    )

    minhash_shingle = (
        "list_transform("
        "  list_distinct([substr(text, i, 5) FOR i IN range(1, greatest(length(text)-4, 1) + 1)]),"
        "  s -> CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) % 2147483647)"
    )

    def sig_col(i: int) -> str:
        a, b = dedup._A[i], dedup._B[i]
        return (
            f"list_min(list_transform(sh, h -> ({a} * h + {b}) % 2147483647)) AS sig_{i}"
        )

    # shared MinHash-LSH CTE fragment (sh -> sigs -> banded): used verbatim
    # by BOTH the minhash_lsh_pairs and dedup_components oracles so the two
    # value checks can never desynchronise
    lsh_ctes = f"""
            sh AS (SELECT doc_id, {minhash_shingle} AS sh FROM documents),
            sigs AS (
              SELECT doc_id, [{', '.join(
                  f'list_min(list_transform(sh, h -> ({dedup._A[i]} * h '
                  f'+ {dedup._B[i]}) % 2147483647))' for i in range(16))}] AS sig
              FROM sh),
            banded AS (
              SELECT doc_id, b,
                     md5(array_to_string(sig[b*4 + 1 : b*4 + 4], ',')) AS bhash
              FROM sigs, (SELECT unnest([0, 1, 2, 3]) AS b))"""

    raw_shingle_hashes = (
        "list_transform("
        "  list_distinct([substr(text, i, 5) FOR i IN range(1, greatest(length(text)-4, 1) + 1)]),"
        "  s -> CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT))"
    )
    simhash_bits = " + ".join(
        f"(CASE WHEN 2 * list_sum(list_transform(hs, h -> (h // {1 << b}) % 2)) "
        f"> len(hs) THEN {1 << b} ELSE 0 END)"
        for b in range(16)
    )

    from geedim_spark.operators.text import _LANG_MARKERS

    def _hits_sql(words: list[str]) -> str:
        wl = "[" + ",".join(f"'{w}'" for w in words) + "]"
        return (
            r"len(list_filter(list_transform("
            r"list_filter(regexp_split_to_array(lower(text),'\s+'), x -> x <> ''),"
            r" t -> regexp_replace(t,'[^a-z]','','g')),"
            f" t -> list_contains({wl}, t)))"
        )

    sql = {
        "spatial_join": f"""
            WITH images AS ({images}), rois AS ({rois})
            SELECT image_id, roi_id FROM images JOIN rois
            ON x0 <= rx1 AND x1 >= rx0 AND y0 <= ry1 AND y1 >= ry0
        """,
        "geo_spatial_join": f"""
            WITH imgs AS (
              SELECT id AS image_id,
                     (CAST(id AS DOUBLE) * 73 % 3600) / 10.0 - 180.0 AS cx,
                     (CAST(id AS DOUBLE) * 37 % 1500) / 10.0 - 75.0 AS cy,
                     1.0 + CAST(id AS DOUBLE) % 7 AS hw,
                     1.0 + CAST(id AS DOUBLE) % 5 AS hh
              FROM range({min(n, 3000)}) t(id)),
            ib AS (
              SELECT image_id,
                     CASE WHEN cx - hw < -180 THEN cx - hw + 360
                          WHEN cx - hw > 180 THEN cx - hw - 360
                          ELSE cx - hw END AS x0,
                     cy - hh AS y0,
                     CASE WHEN cx + hw > 180 THEN cx + hw - 360
                          WHEN cx + hw < -180 THEN cx + hw + 360
                          ELSE cx + hw END AS x1,
                     cy + hh AS y1
              FROM imgs),
            rois AS (
              SELECT id AS roi_id,
                     (CAST(id AS DOUBLE) * 977 % 3600) / 10.0 - 180.0 AS cx,
                     (CAST(id AS DOUBLE) * 311 % 1400) / 10.0 - 70.0 AS cy,
                     3.0 + CAST(id AS DOUBLE) % 9 AS hw,
                     2.0 + CAST(id AS DOUBLE) % 6 AS hh
              FROM range({min(m, 60)}) t(id)),
            rb AS (
              SELECT roi_id,
                     CASE WHEN cx - hw < -180 THEN cx - hw + 360
                          WHEN cx - hw > 180 THEN cx - hw - 360
                          ELSE cx - hw END AS rx0,
                     cy - hh AS ry0,
                     CASE WHEN cx + hw > 180 THEN cx + hw - 360
                          WHEN cx + hw < -180 THEN cx + hw + 360
                          ELSE cx + hw END AS rx1,
                     cy + hh AS ry1
              FROM rois)
            SELECT image_id, roi_id FROM ib, rb
            WHERE ((CASE WHEN x0 <= x1 THEN x0 <= rx0 AND rx0 <= x1
                         ELSE rx0 >= x0 OR rx0 <= x1 END)
                OR (CASE WHEN rx0 <= rx1 THEN rx0 <= x0 AND x0 <= rx1
                         ELSE x0 >= rx0 OR x0 <= rx1 END))
              AND y0 <= ry1 AND y1 >= ry0
        """,
        "mask_portions": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST(w*h AS BIGINT) AS total_px,
                   CAST((w - f_px)*h AS BIGINT) AS fill_px,
                   -- CLOUD_MASK is the raw (pre-morphology) cloud band;
                   -- S2 rows zero it inside the QA60 unpopulated window
                   CAST(CASE WHEN {mock} THEN 0
                             WHEN {s2} AND NOT ({qa_ok}) THEN 0
                             ELSE c_px*h END AS BIGINT) AS cloud_px,
                   CAST(0 AS BIGINT) AS shadow_px,
                   CAST(({clw})*h AS BIGINT) AS cloudless_px
            FROM images WHERE fmt = 'raw'
        """,
        "landsat_param_portions": f"""
            -- strip closed form of masks.landsat_strip_widths: 40 columns
            -- x 20 rows, widths varied by (a, b, c) = (id%2, id//2%2,
            -- id//4%2); image 0 == the reference fixture's exact fractions
            -- (test_mask.py:482-564)
            SELECT CAST(id AS BIGINT) AS image_id,
                   CAST(720 AS BIGINT) AS fill_px,
                   CAST((12 + a) * 20 AS BIGINT) AS cloud_px,
                   CAST((8 + b) * 20 AS BIGINT) AS shadow_px,
                   CAST((16 - a - b) * 20 AS BIGINT) AS cloudless_px,
                   CAST((24 - a) * 20 AS BIGINT) AS cloudless_nsh_px,
                   CAST((8 + a) * 20 AS BIGINT) AS cloud_ncir_px,
                   CAST((4 + c) * 20 AS BIGINT) AS sat_px,
                   CAST((12 - a - b - c) * 20 AS BIGINT) AS cloudless_sat_px,
                   CAST(80 AS BIGINT) AS nonphys_px,
                   CAST((8 - a - b - c) * 20 AS BIGINT) AS cloudless_np_px,
                   CAST((4 + b) * 20 AS BIGINT) AS aerosol_px,
                   CAST((4 - a - 2*b - c) * 20 AS BIGINT) AS cloudless_aero_px
            FROM (SELECT id, id % 2 AS a, (id // 2) % 2 AS b,
                         (id // 4) % 2 AS c
                  FROM range({min(n, 240)}) t(id))
        """,
        "skew_join": f"""
            WITH big AS (
              SELECT id AS obs_id,
                     CASE WHEN id % 10 < 3 THEN 0
                          ELSE 1 + id % 97 END AS cell,
                     id % 1000 AS v
              FROM range({n * 10}) t(id)),
            dim AS (
              SELECT c.id AS cell, c.id * 4 + a.id AS weight
              FROM range(98) c(id) CROSS JOIN range(4) a(id))
            SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(v * weight) AS BIGINT) AS wsum
            FROM big JOIN dim USING (cell)
            GROUP BY cell
        """,
        "streaming_ingest": f"""
            WITH images AS ({synth.sql_images(min(n, 600))})
            SELECT image_id,
                   CAST(w*h AS BIGINT) AS total_px,
                   CAST((w - f_px)*h AS BIGINT) AS fill_px,
                   CAST(({clw})*h AS BIGINT) AS cloudless_px
            FROM images WHERE fmt = 'raw'
        """,
        "cloud_dist": f"""
            WITH images AS ({images}),
            -- CLOUD_DIST semantics (mask.py:102-117): sources are cloud
            -- pixels among VALID pixels only (nodata is non-cloud), and the
            -- output is masked at invalid pixels -> the sum runs over
            -- x >= f_px.  No cloud anywhere (mock family / c_px = 0) ->
            -- every valid pixel saturates at the clamp.
            cols AS (
              SELECT i.*, x FROM images i, range(40) r(x)
              WHERE fmt = 'raw' AND x >= f_px
            )
            SELECT image_id,
                   CAST(SUM(h * LEAST(5000, CAST({synth.SCALE} AS BIGINT) *
                     CASE WHEN {mock} THEN 9999999
                          -- S2 sources are the post-morphology combined
                          -- strip [w - c_px - 3, w) (empty when c_px <= 2);
                          -- QA60-unpopulated rows have a fully-masked
                          -- CLOUDLESS (reference semantics), so every fill
                          -- pixel is distance 0, not clamp-saturated
                          WHEN {s2} THEN
                            CASE WHEN NOT ({qa_ok}) THEN 0
                                 WHEN c_px > 2
                                 THEN GREATEST(0, (w - c_px - 3) - x)
                                 ELSE 9999999 END
                          WHEN c_px > 0
                               THEN GREATEST(0, (w - c_px) - x)
                          ELSE 9999999 END
                   )) AS BIGINT) AS dist_sum
            FROM cols GROUP BY image_id
        """,
        "tile_grid": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST(b AS INT) AS band_start, CAST(b + 1 AS INT) AS band_stop,
                   CAST(r AS INT) AS row_start, CAST(LEAST(r + 21, h) AS INT) AS row_stop,
                   CAST(c AS INT) AS col_start, CAST(LEAST(c + 21, w) AS INT) AS col_stop
            FROM images, (SELECT unnest([0, 1]) AS b), (SELECT unnest([0, 21]) AS r),
                 (SELECT unnest([0, 21]) AS c)
        """,
        "export_tiles": f"""
            WITH images AS ({images}),
            grid AS (
              SELECT i.*, b, r, c FROM images i,
                   (SELECT unnest([0, 1]) AS b),
                   (SELECT unnest([0, 21]) AS r),
                   (SELECT unnest([0, 21]) AS c)
              WHERE fmt = 'raw')
            SELECT image_id, caption,
                   CAST(b AS INT) AS band_start,
                   CAST(r AS INT) AS row_start,
                   CAST(c AS INT) AS col_start,
                   CAST(
                     (LEAST(r + 21, h) - r) *
                     CASE WHEN b = 0
                          THEN v * GREATEST(0, LEAST(c + 21, w) - GREATEST(c, f_px))
                          -- QA strip value: QA60 bit 10 (1024) on S2 rows,
                          -- QA_PIXEL bit 9 (512) elsewhere
                          ELSE (CASE WHEN {s2} THEN 1024 ELSE 512 END)
                               * GREATEST(0, LEAST(c + 21, w) - GREATEST(c, w - c_px))
                               * CASE WHEN c_px > 0 THEN 1 ELSE 0 END
                     END AS BIGINT) AS pxsum
            FROM grid
        """,
        "band_select": f"""
            WITH images AS ({images})
            SELECT image_id, CAST(1 AS INT) AS n_bands,
                   CAST(v * (w - f_px) * h AS BIGINT) AS pxsum
            FROM images WHERE fmt = 'raw'
        """,
        "cdi_join": f"""
            WITH images AS ({images}),
            base AS (
              -- base QA cloud width before CDI refinement: S2 rows use
              -- QA60 (zeroed inside its unpopulated window), others
              -- QA_PIXEL bit 9
              SELECT *, CASE WHEN {s2} AND NOT ({qa_ok}) THEN 0
                             ELSE c_px END AS base_c
              FROM images WHERE fmt = 'raw')
            SELECT image_id,
                   CAST(h * LEAST(base_c, (i % 4) * 10) AS BIGINT) AS cloud_px,
                   -- QA60-invalid S2 rows: cloudless 0 (masked, not clear)
                   CAST(CASE WHEN {s2} AND NOT ({qa_ok}) THEN 0
                             ELSE (w - f_px) * h
                                  - h * LEAST(base_c, (i % 4) * 10)
                        END AS BIGINT) AS cloudless_px,
                   TRUE AS cdi_matched
            FROM base
        """,
        "morphology": f"""
            WITH images AS ({images})
            SELECT image_id,
                   -- cast = union of the strip shifted west by t=0..5
                   -- (sources included, EE ddt distance 0 is unmasked):
                   -- [w-c-5, w) -> width c+5 (never clipped: c<=12, w=40)
                   CAST(CASE WHEN c_px > 0
                             THEN h * (c_px + 5) ELSE 0 END AS BIGINT)
                     AS cast_px,
                   CAST(CASE WHEN c_px > 0
                             THEN h * LEAST(w, c_px + 2) ELSE 0 END AS BIGINT)
                     AS dilated_px,
                   CAST(h * GREATEST(0, c_px - 2) AS BIGINT) AS eroded_px
            FROM images WHERE fmt = 'raw'
        """,
        "streaming_score_join": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST(w * h AS BIGINT) AS total_px,
                   CAST((w - f_px) * h AS BIGINT) AS fill_px,
                   CAST(CASE WHEN i % 2 = 0
                             THEN GREATEST(0, ((i % 10) * 4) - f_px) * h
                             ELSE 0 END AS BIGINT) AS cloudless_px,
                   (i % 2 = 0) AS score_matched
            FROM images WHERE fmt = 'raw' AND i < 600
        """,
        "s2_score_join": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST(w * h AS BIGINT) AS total_px,
                   CAST((w - f_px) * h AS BIGINT) AS fill_px,
                   CAST(CASE WHEN i % 2 = 0
                             THEN GREATEST(0, ((i % 10) * 4) - f_px) * h
                             ELSE 0 END AS BIGINT) AS cloudless_px,
                   (i % 2 = 0) AS score_matched
            FROM images WHERE fmt = 'raw'
        """,
        "resample": f"""
            WITH images AS ({images}),
            -- 2x bilinear upsample in x: replicate _lin_weights exactly
            -- (pixel-centre positions, clamp-then-weight edge handling)
            bil AS (
              SELECT image_id,
                     SUM((CASE WHEN lo >= f_px THEN v ELSE 0 END) * (1 - t)
                         + (CASE WHEN hi >= f_px THEN v ELSE 0 END) * t) AS rowsum,
                     SUM(bicv) AS bicsum
              FROM (
                SELECT i.*,
                       LEAST(GREATEST(CAST(floor(0.5 * x - 0.25) AS BIGINT), 0), w - 1) AS lo,
                       LEAST(LEAST(GREATEST(CAST(floor(0.5 * x - 0.25) AS BIGINT), 0), w - 1) + 1, w - 1) AS hi,
                       LEAST(GREATEST((0.5 * x - 0.25)
                         - LEAST(GREATEST(CAST(floor(0.5 * x - 0.25) AS BIGINT), 0), w - 1), 0.0), 1.0) AS t,
                       {_bicubic_val()} AS bicv
                FROM images i, range(80) r(x) WHERE fmt = 'raw')
              GROUP BY image_id)
            SELECT i.image_id,
                   -- f_px is 4-aligned: 4x block means reduce to the strip sum / 16
                   CAST(v * (w - f_px) * h AS DOUBLE) / 16 AS avg_b0_sum,
                   -- the QA strip is NOT 4-aligned: fractional block means
                   -- still sum to qa * c_px * h / 16 exactly
                   CAST((CASE WHEN {s2} THEN 1024 ELSE 512 END)
                        * c_px * h AS DOUBLE) / 16 AS avg_qa_sum,
                   CAST(bil.rowsum * h AS DOUBLE) AS bilin_b0_sum,
                   CAST(bil.bicsum * h AS DOUBLE) AS bicub_b0_sum
            FROM images i JOIN bil USING (image_id) WHERE fmt = 'raw'
        """,
        "prepare_export": f"""
            WITH images AS ({images})
            SELECT image_id,
                   -- band 0: clip(1.75*v - 20, 0, 255) truncated; the fill
                   -- strip (v=0) clips to 0 after the offset
                   CAST(h * (w - f_px) *
                        trunc(LEAST(GREATEST(1.75 * v - 20, 0), 255))
                        AS BIGINT) AS b0_sum,
                   -- QA band untouched by scale/offset; 512/1024 saturate
                   CAST(h * c_px * 255 *
                        CASE WHEN c_px > 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS qa_sum
            FROM images WHERE fmt = 'raw'
        """,
        "mask_clouds": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST(v * ({clw}) * h AS BIGINT) AS masked_sum
            FROM images WHERE fmt = 'raw'
        """,
        "band_props": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST(CASE WHEN {mock} THEN 1.0
                             WHEN {s2} THEN 1e-4
                             ELSE 2.75e-05 END AS DOUBLE) AS b1_scale,
                   (CASE WHEN {mock} THEN 1.0
                         WHEN {s2} THEN 1e-4
                         ELSE 2.75e-05 END) * (v * (w - f_px) * h)
                   + (CASE WHEN {mock} OR {s2} THEN 0.0 ELSE -0.2 END)
                     * (w * h) AS refl_sum
            FROM images WHERE fmt = 'raw'
        """,
        "geotiff_roundtrip": f"""
            WITH images AS ({synth.sql_images(min(n, 600))})
            SELECT image_id, TRUE AS pixels_ok, TRUE AS transform_ok,
                   TRUE AS crs_ok, TRUE AS nodata_ok
            FROM images WHERE fmt = 'raw'
        """,
        "sort_portion": f"""
            WITH images AS ({images}),
            p AS (
              SELECT image_id,
                     (100.0 * ({clw}) * h) / ((w - f_px) * h) AS portion
              FROM images WHERE fmt = 'raw')
            SELECT image_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY portion DESC, image_id)
                        AS BIGINT) AS rank
            FROM p
        """,
        "streaming_windows": """
            SELECT date_trunc('day', ts) AS window_start, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        """,
        "halo_edt": f"""
            WITH images AS ({synth.sql_images(min(n, 1200))}),
            cols AS (
              SELECT i.*, x FROM images i, range(40) r(x)
              WHERE fmt = 'raw' AND i % 3 = 1 AND x >= f_px
            )
            SELECT image_id,
                   CAST(SUM(h * LEAST(200, CAST({synth.SCALE} AS BIGINT) *
                     CASE WHEN c_px > 0
                          THEN GREATEST(0, (w - c_px) - x) ELSE 9999999 END
                   )) AS BIGINT) AS dist_sum
            FROM cols GROUP BY image_id
        """,
        "s2_qa_portions": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST(w*h AS BIGINT) AS total_px,
                   CAST((w - f_px)*h AS BIGINT) AS fill_px,
                   CAST(CASE WHEN {qa_ok} THEN c_px*h ELSE 0 END AS BIGINT)
                     AS cloud_px,
                   CAST(0 AS BIGINT) AS shadow_px,
                   CAST(CASE WHEN {qa_ok}
                             THEN (w - f_px - ({s2_ceff}))*h
                             ELSE 0 END AS BIGINT) AS cloudless_px
            FROM images WHERE fmt = 'raw' AND i % 3 = 2
        """,
        "s2_score_thresh": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST(w * h AS BIGINT) AS total_px,
                   CAST((w - f_px) * h AS BIGINT) AS fill_px,
                   CAST(CASE WHEN i % 2 = 0 THEN (w - f_px) * h
                             ELSE 0 END AS BIGINT) AS cloudless_px,
                   (i % 2 = 0) AS score_matched
            FROM images WHERE fmt = 'raw'
        """,
        "s2_prob_join": f"""
            WITH images AS ({images}),
            base AS (
              -- prob strip [0, p_px) with p_px = (i%10)*4: erode 2 px,
              -- dilate 5 px -> combined [0, p_px+3) (empty when p_px <= 2)
              SELECT *, (i % 10) * 4 AS p_px FROM images WHERE fmt = 'raw')
            SELECT image_id,
                   CAST(w * h AS BIGINT) AS total_px,
                   CAST((w - f_px) * h AS BIGINT) AS fill_px,
                   CAST(CASE WHEN i % 2 = 0
                             THEN (w - GREATEST(f_px,
                                    CASE WHEN p_px > 2
                                         THEN LEAST(w, p_px + 3)
                                         ELSE 0 END)) * h
                             ELSE 0 END AS BIGINT) AS cloudless_px,
                   (i % 2 = 0) AS prob_matched
            FROM base
        """,
        "dct8_psnr": f"""
            WITH images AS ({images})
            SELECT image_id, caption, TRUE AS psnr_ok
            FROM images WHERE fmt = 'dct8'
        """,
        "doc_quality": r"""
            SELECT doc_id,
                   CAST(round(CASE WHEN length(text) > 0
                        THEN CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                             / length(text) ELSE 0.0 END, 6) AS DOUBLE) AS alpha_ratio,
                   CAST(round(CASE WHEN ntok > 0 THEN hits / ntok ELSE 0.0 END, 6)
                        AS DOUBLE) AS stopword_ratio
            FROM (
              SELECT doc_id, text,
                     CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                          x -> x <> '')) AS DOUBLE) AS ntok,
                     CAST(len(list_filter(list_transform(
                            list_filter(regexp_split_to_array(lower(text), '\s+'),
                                        x -> x <> ''),
                            t -> regexp_replace(t, '[^a-z]', '', 'g')),
                          t -> list_contains(['the','and','of','to','in','is',
                                              'that','it','for','was'], t)))
                          AS DOUBLE) AS hits
              FROM documents)
        """,
        "mask_polygons": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST(CASE WHEN f_px < w THEN 1 ELSE 0 END AS INT) AS n_fill_polys,
                   CAST((w - f_px) * h * {synth.SCALE} * {synth.SCALE} AS BIGINT)
                     AS fill_area,
                   CAST(CASE WHEN c_px > 0 THEN 1 ELSE 0 END AS INT) AS n_cloud_polys,
                   CAST(c_px * h * {synth.SCALE} * {synth.SCALE} AS BIGINT)
                     AS cloud_area
            FROM images WHERE fmt = 'raw'
        """,
        "tiled_portions": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST((w - f_px) * h AS BIGINT) AS fill_px,
                   CAST(({clw}) * h AS BIGINT) AS cloudless_px,
                   CAST(4 AS BIGINT) AS n_tiles
            FROM images WHERE fmt = 'raw'
        """,
        "search": f"""
            WITH images AS ({images})
            SELECT image_id, caption, time_start FROM images
            WHERE fmt = 'raw'
              AND time_start >= TIMESTAMP '2024-01-01'
              AND time_start < TIMESTAMP '2025-06-01'
              AND cloud_cover <= 50
              AND EXISTS (
                SELECT 1 FROM ({rois}) r
                WHERE x0 <= rx1 AND x1 >= rx0 AND y0 <= ry1 AND y1 >= ry0)
              AND (100.0 * ({clw}) / (w - f_px)) >= 60.0
        """,
        "date_filter_1ms": f"""
            WITH images AS ({images})
            SELECT image_id, time_start FROM images
            WHERE time_start >= TIMESTAMP '2024-01-01 05:00:00'
              AND time_start < TIMESTAMP '2024-01-01 05:00:00.001'
        """,
        "composite_profile": f"""
            WITH images AS ({synth.sql_images(min(n, 900))}),
            mock AS (SELECT * FROM images
                     WHERE collection = 'MOCK/CONST' AND fmt = 'raw'),
            vals AS (SELECT x, i, v FROM mock, range(40) t(x) WHERE x >= f_px)
            SELECT CAST(x AS INT) AS x,
                   CAST(AVG(v) AS DOUBLE) AS mean_v,
                   CAST(MEDIAN(v) AS DOUBLE) AS median_v,
                   CAST(max_by(v, i) AS DOUBLE) AS mosaic_v
            FROM vals GROUP BY x
        """,
        "composite_monthly": f"""
            WITH images AS ({synth.sql_images(min(n, 900))}),
            mock AS (SELECT * FROM images
                     WHERE collection = 'MOCK/CONST' AND fmt = 'raw'),
            vals AS (SELECT strftime(date_trunc('month', time_start),
                                     '%Y-%m') AS period, x, v
                     FROM mock, range(40) t(x) WHERE x >= f_px)
            SELECT period, CAST(x AS INT) AS x,
                   CAST(MEDIAN(v) AS DOUBLE) AS median_v
            FROM vals GROUP BY 1, 2
        """,
        "composite_tiled_profile": f"""
            WITH images AS ({synth.sql_images(min(n, 900))}),
            mock AS (SELECT * FROM images
                     WHERE collection = 'MOCK/CONST' AND fmt = 'raw'),
            vals AS (SELECT x, v FROM mock, range(40) t(x) WHERE x >= f_px),
            cols AS (SELECT x, AVG(v) AS mean_v FROM vals GROUP BY x)
            SELECT CAST(tr AS INT) AS tr,
                   CAST(x // 20 AS INT) AS tc,
                   CAST(x % 20 AS INT) AS x_local,
                   CAST(mean_v AS DOUBLE) AS mean_v
            FROM cols, (SELECT unnest([0, 1]) AS tr)
        """,
        "composite_tiled_qmosaic": f"""
            WITH images AS ({synth.sql_images(min(n, 900))}),
            lsat AS (SELECT * FROM images
                     WHERE i % 3 = 1 AND fmt = 'raw'
                       AND i % 5 <> 0 AND i % 7 <> 0),
            cols AS (
              SELECT l.*, tc, xl, tc * 20 + xl AS x
              FROM lsat l, (SELECT unnest([0, 1]) AS tc) t, range(20) r(xl)),
            valid AS (SELECT * FROM cols WHERE x >= f_px AND x < w - c_px),
            cd AS (
              -- sources are CLOUD pixels only (mask.py:102-104: invalid /
              -- nodata pixels are non-cloud): tc=0 tiles have no cloud strip
              -- so every valid pixel saturates at the 5000 clamp and the
              -- (time DESC, id) tie order decides; tc=1 tiles rank by the
              -- horizontal distance to the cloud strip
              SELECT image_id, v, time_start, tc, xl,
                     LEAST(5000, CAST({synth.SCALE} AS BIGINT) *
                       CASE WHEN tc = 1 AND c_px > 0
                            THEN (w - c_px) - x ELSE 9999999 END
                     ) AS cdv
              FROM valid),
            win AS (
              SELECT tc, xl, v,
                     ROW_NUMBER() OVER (
                       PARTITION BY tc, xl
                       ORDER BY cdv DESC, time_start DESC, image_id ASC) AS rn
              FROM cd)
            SELECT CAST(tr AS INT) AS tr, CAST(tc AS INT) AS tc,
                   CAST(xl AS INT) AS x_local, CAST(v AS DOUBLE) AS qmosaic_v
            FROM win, (SELECT unnest([0, 1]) AS tr) WHERE rn = 1
        """,
        "qmosaic_halo": f"""
            WITH images AS ({synth.sql_images(min(n, 900))}),
            lsat AS (SELECT * FROM images
                     WHERE i % 3 = 1 AND fmt = 'raw'
                       AND i % 5 <> 0 AND i % 7 <> 0),
            cols AS (
              SELECT l.*, tc, xl, tc * 16 + xl AS x
              FROM lsat l, (SELECT unnest([0, 1, 2]) AS tc) t, range(16) r(xl)
              WHERE xl < CASE WHEN tc = 2 THEN 8 ELSE 16 END),
            valid AS (SELECT * FROM cols WHERE x >= f_px AND x < w - c_px),
            cd AS (
              -- WHOLE-IMAGE distance at every tile column (the halo join
              -- delivers the global EDT): no per-tile saturation branch
              SELECT image_id, v, time_start, tc, xl,
                     LEAST(200, CAST({synth.SCALE} AS BIGINT) *
                           ((w - c_px) - x)) AS cdv
              FROM valid),
            win AS (
              SELECT tc, xl, v,
                     ROW_NUMBER() OVER (
                       PARTITION BY tc, xl
                       ORDER BY cdv DESC, time_start DESC, image_id ASC) AS rn
              FROM cd)
            SELECT CAST(tr AS INT) AS tr, CAST(tc AS INT) AS tc,
                   CAST(xl AS INT) AS x_local, CAST(v AS DOUBLE) AS qmosaic_v
            FROM win, (SELECT unnest([0, 1, 2]) AS tr) WHERE rn = 1
        """,
        "medoid_profile": f"""
            WITH images AS ({synth.sql_images(min(n, 210))}),
            mock AS (SELECT * FROM images
                     WHERE collection = 'MOCK/CONST' AND fmt = 'raw' AND c_px = 0),
            vals AS (SELECT x, i, v FROM mock, range(40) t(x) WHERE x >= f_px),
            dist AS (
              SELECT a.x, a.i, a.v, SUM(ABS(a.v - b.v)) AS d
              FROM vals a JOIN vals b ON a.x = b.x GROUP BY a.x, a.i, a.v)
            SELECT CAST(x AS INT) AS x, CAST(v AS DOUBLE) AS medoid_v
            FROM (SELECT x, v,
                         ROW_NUMBER() OVER (PARTITION BY x ORDER BY d, i DESC) AS rn
                  FROM dist) WHERE rn = 1
        """,
        "image_features": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST(v * (w - f_px) * h AS DOUBLE) / (w * h) AS mean_b1
            FROM images WHERE fmt = 'raw'
        """,
        "sort_date_dist": f"""
            WITH images AS ({images})
            SELECT image_id,
                   CAST(ROW_NUMBER() OVER (
                     ORDER BY ABS(epoch(time_start) - epoch(TIMESTAMP '2024-02-01')) DESC,
                              image_id) AS BIGINT) AS rank
            FROM images
        """,
        "collection_minmax": f"""
            WITH images AS ({images})
            SELECT collection,
                   MIN(time_start) AS min_ts, MAX(time_start) AS max_ts,
                   CAST(COUNT(*) AS BIGINT) AS n_images,
                   array_to_string(list_sort(list(caption))[1:3], '|')
                     AS first_captions
            FROM images GROUP BY collection
        """,
        "union_compat": f"""
            WITH images AS ({images})
            SELECT collection, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT DISTINCT image_id, collection FROM images
                  WHERE i % 2 = 0 OR i % 3 = 0)
            GROUP BY collection
        """,
        "string_fns": f"""
            WITH images AS ({images})
            SELECT image_id,
                   split_part(image_id, '/', -1) AS index_part,
                   replace(image_id, '/', '-') AS safe_name,
                   array_to_string(list_transform(string_split(collection, '/'),
                                                  p -> substr(p, 1, 1)), '') AS abbrev
            FROM images
        """,
        "limit_sorted": """
            SELECT event_id, user_id FROM events
            ORDER BY ts, event_id LIMIT 100
        """,
        "events_sessions": """
            SELECT event_id, user_id,
                   CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM (
              SELECT event_id, user_id, ts,
                     CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                          OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             IS NULL
                          THEN 1 ELSE 0 END AS ns
              FROM events)
        """,
        "session_windows": _SESSION_ORACLE,
        # drained streaming session windows reduce to the same final state
        "streaming_sessions": _SESSION_ORACLE,
        "simhash": f"""
            SELECT doc_id, CAST({simhash_bits} AS BIGINT) AS simhash
            FROM (SELECT doc_id, {raw_shingle_hashes} AS hs FROM documents)
        """,
        "ngram_jaccard": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([substr(text, i, 5)
                                    FOR i IN range(1, greatest(length(text)-4, 1) + 1)]) AS s
              FROM documents),
            pairs AS (SELECT doc_id AS a, doc_id + 1 AS b FROM documents
                      WHERE doc_id < 100)
            SELECT a AS doc_id_a, b AS doc_id_b,
                   CAST(len(list_filter(sa.s, x -> list_contains(sb.s, x))) AS BIGINT)
                     AS n_intersect,
                   CAST(len(sa.s) + len(sb.s)
                        - len(list_filter(sa.s, x -> list_contains(sb.s, x))) AS BIGINT)
                     AS n_union
            FROM pairs JOIN sh sa ON sa.doc_id = a JOIN sh sb ON sb.doc_id = b
        """,
        "lang_id": f"""
            SELECT doc_id,
                   CASE
                     WHEN h_fr > 0 AND h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de
                       THEN 'fr'
                     WHEN h_es > 0 AND h_es >= h_en AND h_es >= h_de THEN 'es'
                     WHEN h_en > 0 AND h_en >= h_de THEN 'en'
                     WHEN h_de > 0 THEN 'de'
                     ELSE 'und'
                   END AS lang_pred
            FROM (SELECT doc_id,
                         {_hits_sql(_LANG_MARKERS['de'])} AS h_de,
                         {_hits_sql(_LANG_MARKERS['en'])} AS h_en,
                         {_hits_sql(_LANG_MARKERS['es'])} AS h_es,
                         {_hits_sql(_LANG_MARKERS['fr'])} AS h_fr
                  FROM documents)
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   CAST(list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(substr(text, 1, 64), ''),
                                      c -> CASE WHEN c = '' THEN 0 ELSE ascii(c) END)),
                     (acc, c) -> (acc * 1000003 + c) % 2147483647) AS BIGINT) AS fp,
                   CAST(length(text) AS BIGINT) AS n_len
            FROM documents
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                     AS sum_base_price_cents,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                     AS sum_disc_price_c4,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT c_custkey, c_name, n_name,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_spent_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY c_custkey, c_name, n_name
            ORDER BY total_spent_cents DESC, c_custkey LIMIT 10
        """,
        "shipping_priority": """
            SELECT l_orderkey, o_orderdate,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                     AS revenue_c4
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10
        """,
        "local_supplier_volume": """
            SELECT n_name,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                     AS revenue_c4,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
                          JOIN supplier ON l_suppkey = s_suppkey
                                       AND c_nationkey = s_nationkey
                          JOIN nation ON s_nationkey = n_nationkey
                          JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1999-01-01'
            GROUP BY n_name
        """,
        "events_recent": """
            SELECT event_id, user_id, rn FROM (
              SELECT event_id, user_id,
                     CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY ts DESC, event_id) AS BIGINT) AS rn
              FROM events) WHERE rn <= 3
        """,
        "events_type_stats": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-02-01'
            GROUP BY event_type
        """,
        "streaming_dedup": """
            SELECT DISTINCT md5(coalesce(text, '')) AS text_hash
            FROM documents
        """,
        "doc_dup_counts": """
            SELECT doc_id,
                   CAST(COUNT(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_copies
            FROM documents
        """,
        "pii_redact": """
            WITH aug AS (
              SELECT doc_id,
                     text || CASE
                       WHEN doc_id % 5 = 0 THEN ' mail: user' ||
                            CAST(doc_id AS VARCHAR) || '@example.com'
                       WHEN doc_id % 5 = 1 THEN ' see https://ex.org/p/' ||
                            CAST(doc_id AS VARCHAR)
                       WHEN doc_id % 5 = 2 THEN ' acct 1234567890' ||
                            CAST(doc_id AS VARCHAR)
                       ELSE '' END AS t
              FROM documents),
            red AS (
              SELECT doc_id, t,
                     regexp_replace(regexp_replace(regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+',
                       '<EMAIL>', 'g'),
                       'https?://[^ ]+', '<URL>', 'g'),
                       '[0-9]{10}[0-9]*', '<ID>', 'g') AS r
              FROM aug)
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+'))
                     AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(t, 'https?://[^ ]+'))
                     AS BIGINT) AS n_url,
                   CAST(len(regexp_extract_all(t, '[0-9]{10}[0-9]*'))
                     AS BIGINT) AS n_id,
                   r AS redacted,
                   CAST(length(r) AS BIGINT) AS n_redacted_chars
            FROM red
        """,
        "repetition_stats": """
            WITH g AS (
              SELECT doc_id,
                     unnest([substr(text, i, 10)
                             FOR i IN range(1, greatest(length(text)-9, 1) + 1)]) AS gram
              FROM documents),
            c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2)
            SELECT doc_id,
                   CAST(SUM(cnt) AS BIGINT) AS n_grams,
                   CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
                     AS n_dup_positions,
                   CAST(MAX(cnt) AS BIGINT) AS max_gram_count
            FROM c GROUP BY 1
        """,
        # same SDXL bucket grid, same exact integer cross-multiplication
        # argmin (list_reduce = the Spark aggregate fold) — no float in
        # the decision path in either engine
        "aspect_bucket": """
            WITH d AS (
              SELECT doc_id,
                     CAST(256 + (doc_id * 37) % 769 AS INT) AS w,
                     CAST(256 + (doc_id * 53) % 769 AS INT) AS h
              FROM documents),
            b AS (
              SELECT doc_id, w, h,
                     list_reduce(
                       [{'mx': greatest(w*bb[2], h*bb[1]),
                         'mn': least(w*bb[2], h*bb[1]),
                         'idx': bb[3], 'bw': bb[1], 'bh': bb[2]}
                        FOR bb IN [
                          [1024,1024,0],[1152,896,1],[896,1152,2],
                          [1216,832,3],[832,1216,4],[1344,768,5],
                          [768,1344,6],[1536,640,7],[640,1536,8]]],
                       (acc, x) -> CASE WHEN x['mx'] * acc['mn'] <
                                             acc['mx'] * x['mn']
                                        THEN x ELSE acc END
                     ) AS best
              FROM d)
            SELECT doc_id, w, h,
                   CAST(best['idx'] AS BIGINT) AS bucket_idx,
                   CAST(best['bw'] AS BIGINT) AS bucket_w,
                   CAST(best['bh'] AS BIGINT) AS bucket_h,
                   CAST(ceil(best['bw'] / 14.0) * ceil(best['bh'] / 14.0)
                        AS BIGINT) AS n_vit_tokens
            FROM b
        """,
        # same portable md5 shard rule as sources/wds.shard_of; a COUNT(*)
        # twin for n_byte_exact is only equal if every sample round-tripped
        "wds_shards": f"""
            WITH images AS ({synth.sql_images(min(n, 400))}),
            s AS (
              SELECT i, image_id,
                     CAST(CONCAT('0x', SUBSTR(md5(CONCAT(image_id, 'wds-v1')),
                          1, 8)) AS BIGINT) % 1000000 % 8 AS shard
              FROM images)
            SELECT shard,
                   CAST(COUNT(*) AS BIGINT) AS n_samples,
                   CAST(COUNT(*) AS BIGINT) AS n_byte_exact,
                   CAST(SUM((i * 2654435761) % 997) AS BIGINT) AS caption_ck
            FROM s GROUP BY shard
        """,
        # same deterministic re-lining (6-word chunks + residue footers),
        # then the C4 rule: corpus-wide line count >= 3 -> dropped
        "line_dedup": """
            WITH w AS (
              SELECT doc_id,
                     regexp_split_to_array(COALESCE(text, ''), ' ') AS words
              FROM documents),
            b AS (
              SELECT doc_id,
                     array_to_string(
                       [array_to_string(words[i*6+1 : i*6+6], ' ')
                        FOR i IN range(0, GREATEST(
                          CAST(ceil(len(words) / 6.0) AS BIGINT), 1))],
                       chr(10))
                     || CASE
                          WHEN doc_id % 7 = 0
                            THEN chr(10) || 'all rights reserved - footer'
                          WHEN doc_id % 11 = 0
                            THEN chr(10) || 'click here to subscribe'
                          ELSE '' END AS text
              FROM w),
            l AS (SELECT doc_id,
                         regexp_split_to_array(text, chr(10)) AS lines
                  FROM b),
            e AS (SELECT doc_id, unnest(lines) AS line,
                         unnest(range(1, len(lines) + 1)) AS pos
                  FROM l),
            c AS (SELECT line, COUNT(*) AS cnt FROM e GROUP BY 1),
            k AS (SELECT e.doc_id, e.pos, e.line
                  FROM e JOIN c USING (line) WHERE c.cnt < 3),
            r AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                         string_agg(line, chr(10) ORDER BY pos) AS clean_text
                  FROM k GROUP BY 1)
            SELECT l.doc_id, CAST(len(l.lines) AS BIGINT) AS n_lines,
                   CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
                   COALESCE(r.clean_text, '') AS clean_text
            FROM l LEFT JOIN r USING (doc_id)
        """,
        # exact replay of the engine's whitespace-token Gopher signals
        # (operators/text.gopher_rules); the corpus has no newlines /
        # '#' / '...' so bullet/ellipsis/symbol rules are trivially true
        # in BOTH engines and the word-count / mean-length / stop-word
        # rules carry the discriminating signal at min_words=40,
        # min_stop_words=1
        "gopher_rules": r"""
            WITH t AS (
              SELECT doc_id,
                     COALESCE(text, '') AS text,
                     list_filter(regexp_split_to_array(COALESCE(text, ''),
                                 '\s+'), x -> x <> '') AS toks
              FROM documents),
            s AS (
              SELECT doc_id, text, toks,
                     CAST(len(toks) AS BIGINT) AS n_words,
                     COALESCE(list_sum(list_transform(toks,
                              x -> length(x))), 0) AS sum_len,
                     CAST(len(list_filter(toks,
                          x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                       AS alpha_words,
                     CAST(len(list_filter(['the','be','to','of','and',
                                           'that','have','with'],
                          s -> list_contains(list_transform(toks,
                               x -> lower(x)), s))) AS BIGINT)
                       AS n_stop_words,
                     (length(text) - length(replace(text, '#', '')))
                       AS n_hash,
                     (length(text) - length(replace(text, '...', ''))) / 3.0
                       AS n_ellipsis,
                     regexp_split_to_array(text, chr(10)) AS lines
              FROM t),
            m AS (
              SELECT doc_id, n_words, n_stop_words,
                     CASE WHEN n_words > 0
                          THEN CAST(sum_len AS DOUBLE) / n_words
                          ELSE 0.0 END AS mean_len,
                     CASE WHEN n_words > 0
                          THEN alpha_words / n_words ELSE 0.0 END
                       AS alpha_ratio,
                     CASE WHEN n_words > 0
                          THEN (n_hash + n_ellipsis) / n_words
                          ELSE 0.0 END AS symbol_ratio,
                     CAST(len(list_filter(lines,
                          l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
                       / len(lines) AS bullet_ratio,
                     CAST(len(list_filter(lines,
                          l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
                       AS DOUBLE) / len(lines) AS ellipsis_ratio
              FROM s)
            SELECT doc_id, n_words,
                   CAST(round(mean_len, 6) AS DOUBLE) AS mean_word_len,
                   n_stop_words,
                   (n_words >= 40 AND n_words <= 100000) AS ok_words,
                   (mean_len >= 3.0 AND mean_len <= 10.0)
                     AS ok_mean_word_len,
                   (symbol_ratio < 0.1) AS ok_symbol_ratio,
                   (bullet_ratio < 0.9) AS ok_bullet_lines,
                   (ellipsis_ratio < 0.3) AS ok_ellipsis_lines,
                   (alpha_ratio > 0.8) AS ok_alpha_words,
                   (n_stop_words >= 1) AS ok_stop_words,
                   ((n_words >= 40 AND n_words <= 100000)
                    AND (mean_len >= 3.0 AND mean_len <= 10.0)
                    AND symbol_ratio < 0.1 AND bullet_ratio < 0.9
                    AND ellipsis_ratio < 0.3 AND alpha_ratio > 0.8
                    AND n_stop_words >= 1) AS keep
            FROM m
        """,
        # survivors-only exact dedup: one group per md5(text) (NULL text
        # via the engine's \x00null sentinel), min-doc_id canonical
        "dedup_apply": """
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM documents
            GROUP BY md5(COALESCE(text, chr(0) || 'null'))
        """,
        # identical md5 derivation: shard from hex digits 1-8, order key
        # from digits 9-16, rank per shard (ties broken by doc_id)
        "epoch_shuffle": """
            WITH k AS (
              SELECT doc_id,
                     md5(CAST(doc_id AS VARCHAR) || ':3:shuffle-v1') AS h
              FROM documents),
            d AS (
              SELECT doc_id,
                     CAST(CONCAT('0x', SUBSTR(h, 1, 8)) AS BIGINT) % 8
                       AS shard,
                     CAST(CONCAT('0x', SUBSTR(h, 9, 8)) AS BIGINT) AS ord
              FROM k)
            SELECT doc_id, shard,
                   CAST(ROW_NUMBER() OVER (PARTITION BY shard
                        ORDER BY ord, doc_id) AS BIGINT) AS epoch_rank
            FROM d
        """,
        # the dedup_components recursive CTE, then keep self-labelled rows
        "near_dedup_apply": f"""
            WITH RECURSIVE {lsh_ctes},
            pairs AS (
              SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
              FROM banded a JOIN banded b USING (b, bhash)
              WHERE a.doc_id < b.doc_id),
            edges AS (
              SELECT pa AS a, pb AS bb FROM pairs
              UNION ALL SELECT pb, pa FROM pairs),
            reach(id, comp) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.bb, r.comp FROM reach r JOIN edges e ON e.a = r.id
              WHERE r.comp < e.bb),
            comps AS (
              SELECT id AS doc_id, MIN(comp) AS component
              FROM reach GROUP BY id)
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d JOIN comps c USING (doc_id)
            WHERE c.component = d.doc_id
        """,
        # identical CDC machinery: codepoints -> 8-char polynomial window
        # hash (base 31, powers 31^7..31^0) -> boundary where hash % 16
        # == 0 at window END -> chunks between cuts -> corpus counts
        "cdc_dup_spans": """
            WITH base AS (
              SELECT doc_id, COALESCE(text, '') AS text,
                     length(COALESCE(text, '')) AS n
              FROM documents),
            codes AS (
              SELECT doc_id, text, n,
                     [CAST(unicode(substr(text, j, 1)) AS BIGINT)
                      FOR j IN range(1, n + 1)] AS c
              FROM base),
            hashes AS (
              SELECT doc_id, text, n,
                     [ (c[i] * 27512614111 + c[i+1] * 887503681
                        + c[i+2] * 28629151 + c[i+3] * 923521
                        + c[i+4] * 29791 + c[i+5] * 961
                        + c[i+6] * 31 + c[i+7]) % 16
                       FOR i IN range(1, greatest(n - 7, 0) + 1) ] AS hm
              FROM codes),
            bounds AS (
              SELECT doc_id, text, n,
                     list_filter([CASE WHEN hm[i] = 0 THEN i + 7
                                  ELSE 0 END
                                  FOR i IN range(1, len(hm) + 1)],
                                 p -> p > 0) AS b
              FROM hashes),
            cuts AS (
              SELECT doc_id, text,
                     list_concat([0], list_concat(b, [n])) AS cut
              FROM bounds),
            ex AS (
              SELECT doc_id, unnest(list_filter(
                       [substr(text, cut[k] + 1, cut[k+1] - cut[k])
                        FOR k IN range(1, len(cut))],
                       ch -> ch <> '')) AS chunk
              FROM cuts),
            cnt AS (SELECT chunk, COUNT(*) AS c FROM ex GROUP BY 1),
            per AS (
              SELECT e.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_chunks,
                     CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_dup_chunks,
                     CAST(SUM(CASE WHEN c >= 2 THEN length(chunk)
                              ELSE 0 END) AS BIGINT) AS dup_chars
              FROM ex e JOIN cnt USING (chunk) GROUP BY 1)
            SELECT b.doc_id,
                   COALESCE(p.n_chunks, 0) AS n_chunks,
                   COALESCE(p.n_dup_chunks, 0) AS n_dup_chunks,
                   COALESCE(p.dup_chars, 0) AS dup_chars,
                   CAST(b.n AS BIGINT) AS n_chars
            FROM base b LEFT JOIN per p USING (doc_id)
        """,
        # identical whitespace-lowercase tokens, within-doc then corpus
        # counts, ln() likelihood sums rounded to 6
        "token_rarity": r"""
            WITH ex AS (
              SELECT doc_id, unnest(list_filter(
                       regexp_split_to_array(lower(COALESCE(text, '')),
                                             '\s+'), x -> x <> '')) AS token
              FROM documents),
            dt AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS k
                   FROM ex GROUP BY 1, 2),
            c AS (SELECT token, CAST(SUM(k) AS BIGINT) AS cnt
                  FROM dt GROUP BY 1),
            tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total FROM c),
            per AS (
              SELECT doc_id,
                     CAST(SUM(k) AS BIGINT) AS n_tokens,
                     CAST(SUM(k * cnt) AS BIGINT) AS sum_freq,
                     -SUM(k * ln(cnt / n_total)) / SUM(k) AS nll
              FROM dt JOIN c USING (token), tot GROUP BY 1)
            SELECT d.doc_id,
                   COALESCE(p.n_tokens, 0) AS n_tokens,
                   COALESCE(p.sum_freq, 0) AS sum_freq,
                   CAST(round(CASE WHEN p.n_tokens > 0
                        THEN CAST(p.sum_freq AS DOUBLE) / p.n_tokens
                        ELSE 0.0 END, 6) AS DOUBLE) AS avg_freq,
                   CAST(round(COALESCE(p.nll, 0.0), 6) AS DOUBLE) AS nll
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        # same quantised buckets as ann_lsh, round(cos,6) ranking with
        # nbr_id tiebreak, majority vote ties toward the smallest label
        "label_noise": f"""
            WITH emb AS (
              SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings),
            qemb AS (
              SELECT vec_id, label, e,
                     list_transform(e, x -> CAST(FLOOR(x * 4096.0)
                       AS BIGINT)) AS qv
              FROM emb),
            bkt AS (SELECT vec_id, label, e, {_lsh_bucket_sql()} AS bucket
                    FROM qemb),
            sims AS (
              SELECT a.vec_id, b.vec_id AS nbr_id, b.label AS nbr_label,
                     round(list_dot_product(a.e, b.e)
                       / NULLIF(sqrt(list_dot_product(a.e, a.e))
                                * sqrt(list_dot_product(b.e, b.e)), 0),
                       6) AS sim
              FROM bkt a JOIN bkt b
                ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
            topk AS (
              SELECT vec_id, nbr_id, nbr_label FROM (
                SELECT vec_id, nbr_id, nbr_label,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                         ORDER BY sim DESC, nbr_id) AS rank
                FROM sims WHERE sim IS NOT NULL)
              WHERE rank <= 5),
            votes AS (
              SELECT vec_id, nbr_label,
                     CAST(COUNT(*) AS BIGINT) AS n_agree
              FROM topk GROUP BY 1, 2),
            win AS (
              SELECT vec_id, nbr_label AS knn_label, n_agree FROM (
                SELECT vec_id, nbr_label, n_agree,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                         ORDER BY n_agree DESC, nbr_label) AS r
                FROM votes) WHERE r = 1),
            nn AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_nbrs
                   FROM topk GROUP BY 1)
            SELECT e.vec_id, e.label,
                   COALESCE(nn.n_nbrs, 0) AS n_nbrs,
                   win.knn_label,
                   COALESCE(win.n_agree, 0) AS n_agree,
                   (win.knn_label IS NOT NULL
                    AND win.knn_label <> e.label) AS is_suspect
            FROM embeddings e
            LEFT JOIN win USING (vec_id) LEFT JOIN nn USING (vec_id)
        """,
        # batch interval join = what the drained stream-stream join must
        # equal; delays in exact integer microseconds (epoch_us)
        "stream_stream_join": """
            WITH l AS (SELECT event_id AS l_id, user_id, ts AS l_ts
                       FROM events WHERE event_type = 'view'),
            r AS (SELECT event_id AS r_id, user_id, ts AS r_ts
                  FROM events WHERE event_type = 'purchase'),
            j AS (SELECT l.user_id,
                         epoch_us(r.r_ts) - epoch_us(l.l_ts) AS d
                  FROM l JOIN r ON l.user_id = r.user_id
                   AND r.r_ts > l.l_ts
                   AND r.r_ts <= l.l_ts + INTERVAL 1 HOUR)
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(d) AS BIGINT) AS sum_delay_us,
                   CAST(MAX(d) AS BIGINT) AS max_delay_us
            FROM j GROUP BY 1
        """,
        # exact type-1 quantiles replayed over the same histogram; the
        # threshold (p*N + 999) // 1000 is pure integer in both engines
        "length_quantiles": r"""
            WITH lens AS (
              SELECT CAST(len(list_filter(regexp_split_to_array(
                       COALESCE(text, ''), '\s+'), x -> x <> ''))
                     AS BIGINT) AS n_tokens
              FROM documents),
            hist AS (SELECT n_tokens, CAST(COUNT(*) AS BIGINT) AS cnt
                     FROM lens GROUP BY 1),
            cum AS (SELECT n_tokens,
                           SUM(cnt) OVER (ORDER BY n_tokens) AS cum
                    FROM hist),
            tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_docs FROM hist),
            p AS (SELECT unnest([100, 250, 500, 750, 900, 990, 1000])
                    AS permille),
            probe AS (SELECT permille, n_docs,
                             (CAST(permille AS BIGINT) * n_docs + 999)
                               // 1000 AS thr
                      FROM p, tot)
            SELECT CAST(permille AS INT) AS permille, n_docs,
                   CAST(MIN(n_tokens) AS BIGINT) AS value
            FROM cum JOIN probe ON cum >= thr
            GROUP BY 1, 2
        """,
        # zonal closed form: pixel centre x = x0+10c+5 / y = y1-10r-5;
        # zone bounds are +0.5-shifted so centres never tie an edge; valid
        # cols additionally >= f_px (band-0 fill strip); n_px = rows*cols
        "zonal_stats": f"""
            WITH images AS ({synth.sql_images(min(n, 900))}),
            z AS (SELECT roi_id AS zone_id,
                         rx0 + 0.5 AS zx0, ry0 + 0.5 AS zy0,
                         rx1 + 0.5 AS zx1, ry1 + 0.5 AS zy1
                  FROM ({synth.sql_rois(m)})),
            pair AS (
              SELECT i.image_id, i.v, i.f_px, i.x0, i.y1,
                     z.zone_id, z.zx0, z.zy0, z.zx1, z.zy1
              FROM images i JOIN z
                ON z.zx0 < i.x1 AND i.x0 < z.zx1
               AND z.zy0 < i.y1 AND i.y0 < z.zy1
              WHERE i.fmt = 'raw'),
            g AS (
              SELECT image_id, zone_id, v,
                     GREATEST(CAST(FLOOR((zx0 - x0 - 5) / 10) AS BIGINT) + 1,
                              CAST(f_px AS BIGINT)) AS c_lo,
                     LEAST(CAST(CEIL((zx1 - x0 - 5) / 10) AS BIGINT) - 1,
                           39) AS c_hi,
                     GREATEST(CAST(FLOOR((y1 - zy1 - 5) / 10) AS BIGINT) + 1,
                              0) AS r_lo,
                     LEAST(CAST(CEIL((y1 - zy0 - 5) / 10) AS BIGINT) - 1,
                           39) AS r_hi
              FROM pair),
            s AS (
              SELECT image_id, zone_id, v,
                     GREATEST(c_hi - c_lo + 1, 0)
                     * GREATEST(r_hi - r_lo + 1, 0) AS n_px
              FROM g)
            SELECT image_id, zone_id, CAST(n_px AS BIGINT) AS n_px,
                   CAST(v * n_px AS DOUBLE) AS sum_val,
                   CAST(CASE WHEN n_px > 0 THEN v ELSE 0 END AS DOUBLE)
                     AS min_val,
                   CAST(CASE WHEN n_px > 0 THEN v ELSE 0 END AS DOUBLE)
                     AS max_val,
                   CAST(CASE WHEN n_px > 0 THEN v ELSE 0 END AS DOUBLE)
                     AS mean_val
            FROM s
        """,
        # full DSIR model replay: same md5 bucket, add-1 smoothing over
        # 256 buckets, target = lang='en'; NULL-lang rows train neither
        # model (CASE falls through to 0 in both engines) but are scored
        "dsir_weights": r"""
            WITH base AS (
              SELECT doc_id, (lang = 'en') AS is_target,
                     list_filter(regexp_split_to_array(
                       lower(COALESCE(text, '')), '\s+'),
                       x -> x <> '') AS t
              FROM documents),
            feats AS (
              SELECT doc_id, is_target,
                     unnest(list_concat(t,
                       CASE WHEN len(t) >= 2 THEN list_transform(
                              range(1, len(t)),
                              i -> t[i] || ' ' || t[i + 1])
                            ELSE [] END)) AS feat
              FROM base),
            bkt AS (
              SELECT doc_id, is_target,
                     CAST(CONCAT('0x', SUBSTR(md5(feat || 'dsir-v1'),
                          1, 8)) AS BIGINT) % 256 AS bucket
              FROM feats),
            k AS (SELECT doc_id, is_target, bucket,
                         CAST(COUNT(*) AS BIGINT) AS k
                  FROM bkt GROUP BY 1, 2, 3),
            model AS (
              SELECT bucket,
                     CAST(SUM(CASE WHEN is_target THEN k ELSE 0 END)
                       AS BIGINT) AS t_cnt,
                     CAST(SUM(CASE WHEN NOT is_target THEN k ELSE 0 END)
                       AS BIGINT) AS r_cnt
              FROM k GROUP BY 1),
            tot AS (SELECT CAST(SUM(t_cnt) AS DOUBLE) AS t_total,
                           CAST(SUM(r_cnt) AS DOUBLE) AS r_total
                    FROM model),
            ratio AS (
              SELECT bucket,
                     ln((t_cnt + 1.0) / (t_total + 256.0))
                     - ln((r_cnt + 1.0) / (r_total + 256.0)) AS lr
              FROM model, tot),
            per AS (
              SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_feats,
                     SUM(k * lr) AS lw
              FROM k JOIN ratio USING (bucket) GROUP BY 1)
            SELECT d.doc_id, (d.lang = 'en') AS is_target,
                   COALESCE(p.n_feats, 0) AS n_feats,
                   CAST(round(COALESCE(p.lw, 0.0), 6) AS DOUBLE)
                     AS log_weight
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        "decontam": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([substr(text, i, 5)
                                    FOR i IN range(1, greatest(length(text)-4, 1) + 1)]) AS s
              FROM documents),
            b AS (SELECT doc_id AS bench_id, s AS bs FROM sh
                  WHERE doc_id % 499 = 0)
            SELECT d.doc_id, b.bench_id,
                   CAST(len(list_filter(d.s, x -> list_contains(b.bs, x)))
                     AS BIGINT) AS n_hits
            FROM sh d, b
            WHERE len(list_filter(d.s, x -> list_contains(b.bs, x))) > 0
        """,
        # same md5 hash-bucket shard as the engine (sampling.hash_bucket
        # % 16), same (shard, doc_id)-ordered cumsum, same floor rule
        "pack_sequences": """
            WITH t AS (
              SELECT doc_id,
                     CAST(CONCAT('0x', SUBSTR(md5(CONCAT(CAST(doc_id AS VARCHAR),
                          'pack-v1')), 1, 8)) AS BIGINT) % 1000000 % 16 AS shard,
                     CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                          x -> x <> '')) AS BIGINT) AS n_tokens
              FROM documents),
            c AS (
              SELECT doc_id, shard, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - n_tokens
                       AS cum_before
              FROM t)
            SELECT shard,
                   CAST(FLOOR(cum_before / 512.0) AS BIGINT) AS pack,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(MIN(doc_id) AS BIGINT) AS first_doc
            FROM c
            GROUP BY 1, 2
        """,
        "doc_token_stats": r"""
            SELECT doc_id,
                   CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                        x -> x <> '')) AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text,
                        '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])', 1)) AS BIGINT)
                     AS n_bpe_tokens,
                   CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
                   CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
                   CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS BIGINT) AS n_punct
            FROM documents
        """,
        "minhash_sig": f"""
            SELECT doc_id, {', '.join(sig_col(i) for i in range(4))}
            FROM (SELECT doc_id, {minhash_shingle} AS sh FROM documents)
        """,
        "minhash_lsh_pairs": f"""
            WITH {lsh_ctes}
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared_bands
            FROM banded a JOIN banded b USING (b, bhash)
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        """,
        "embed_near_dup": """
            SELECT vec_id AS id_a, vec_id + 100000 AS id_b
            FROM embeddings WHERE vec_id < 50
        """,
        "dedup_components": f"""
            WITH RECURSIVE {lsh_ctes},
            pairs AS (
              SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
              FROM banded a JOIN banded b USING (b, bhash)
              WHERE a.doc_id < b.doc_id),
            edges AS (
              SELECT pa AS a, pb AS bb FROM pairs
              UNION ALL SELECT pb, pa FROM pairs),
            -- min-label reachability: label c spreads from its node along
            -- edges; the c < bb prune is lossless (the minimum always
            -- passes it) and keeps the enumeration subquadratic
            reach(id, comp) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.bb, r.comp FROM reach r JOIN edges e ON e.a = r.id
              WHERE r.comp < e.bb)
            SELECT id AS doc_id, CAST(MIN(comp) AS BIGINT) AS component
            FROM reach GROUP BY id
        """,
        "ann_lsh": f"""
            WITH emb AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings),
            qemb AS (
              SELECT vec_id, e,
                     list_transform(e, x -> CAST(FLOOR(x * 4096.0) AS BIGINT)) AS qv
              FROM emb),
            bkt AS (SELECT vec_id, e, {_lsh_bucket_sql()} AS bucket FROM qemb),
            q AS (SELECT vec_id AS query_id, e AS qe, bucket AS qb
                  FROM bkt WHERE vec_id < 5),
            sims AS (
              SELECT query_id, vec_id AS neighbor_id,
                     list_dot_product(qe, e) /
                       (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))) AS sim
              FROM bkt JOIN q ON bucket = qb AND vec_id <> query_id)
            SELECT query_id, neighbor_id, rank FROM (
              SELECT query_id, neighbor_id,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY round(sim, 6) DESC, neighbor_id) AS BIGINT) AS rank
              FROM sims) WHERE rank <= 10
        """,
        "ann_ivf_flat": """
            WITH emb AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings),
            cent AS (SELECT vec_id AS cid, e AS ce FROM emb WHERE vec_id < 8),
            scored AS (
              SELECT vec_id, e, cid,
                     round(list_dot_product(e, ce) /
                           (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(ce, ce))), 6) AS csim
              FROM emb, cent),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY csim DESC, cid) AS crank
              FROM scored),
            assigned AS (SELECT vec_id, e, cid AS cluster FROM ranked WHERE crank = 1),
            probes AS (
              SELECT vec_id AS query_id, e AS qe, cid AS cluster
              FROM ranked WHERE vec_id < 5 AND crank <= 2),
            sims AS (
              SELECT query_id, a.vec_id AS neighbor_id,
                     list_dot_product(qe, a.e) /
                       (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(a.e, a.e))) AS sim
              FROM assigned a JOIN probes p USING (cluster)
              WHERE a.vec_id <> p.query_id)
            SELECT query_id, neighbor_id, rank FROM (
              SELECT query_id, neighbor_id,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY round(sim, 6) DESC, neighbor_id) AS BIGINT) AS rank
              FROM sims) WHERE rank <= 10
        """,
        "ann_topk": """
            WITH emb AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings),
            q AS (SELECT vec_id AS query_id, e AS qe FROM emb WHERE vec_id < 5),
            sims AS (
              SELECT query_id, vec_id AS neighbor_id,
                     list_dot_product(qe, e) /
                       (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))) AS sim
              FROM emb, q WHERE vec_id <> query_id)
            SELECT query_id, neighbor_id, rank FROM (
              SELECT query_id, neighbor_id,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY round(sim, 6) DESC, neighbor_id) AS BIGINT) AS rank
              FROM sims) WHERE rank <= 10
        """,
        "embed_dup_counts": """
            WITH emb AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 200000, embedding FROM embeddings
              WHERE vec_id < 40),
            keyed AS (
              SELECT vec_id,
                     md5(array_to_string(list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 4096) AS BIGINT)),
                       ',')) AS k
              FROM emb)
            SELECT vec_id,
                   CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS n_copies
            FROM keyed
        """,
        # Lloyd centroids are not SQL-expressible; the contract is the
        # quality assertion itself (see q_ann_ivf) — the oracle states the
        # expected assertion outcome.
        "ann_ivf": """
            SELECT CAST(10 AS BIGINT) AS k,
                   CAST(5 AS BIGINT) AS n_queries,
                   CAST(1 AS BIGINT) AS recall_ge_30pct
        """,
        # vocabulary twin: DuckDB regenerates the distinct trigram sets
        # exactly like the engine's shingles() (the ngram_jaccard pattern)
        "top_ngrams": """
            WITH grams AS (
              SELECT DISTINCT doc_id, g AS ngram
              FROM (
                SELECT doc_id,
                       UNNEST(list_transform(
                         range(1, GREATEST(length(COALESCE(text, '')) - 2, 1) + 1),
                         i -> substr(COALESCE(text, ''), CAST(i AS INT), 3)
                       )) AS g
                FROM documents)),
            counts AS (
              SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM grams GROUP BY ngram)
            SELECT ngram, n_docs,
                   CAST(ROW_NUMBER() OVER (
                     ORDER BY n_docs DESC, ngram) AS BIGINT) AS rank
            FROM counts
            QUALIFY rank <= 50
        """,
        # exact row-set twin of the content-hash mixer: same md5 bucket,
        # same thresholds; in_smaller recomputes the nested draw
        "stratified_sample": """
            WITH b AS (
              SELECT doc_id, lang,
                     CAST(CONCAT('0x', SUBSTR(md5(CONCAT(CAST(doc_id AS VARCHAR),
                          'mix-v1')), 1, 8)) AS BIGINT) % 1000000 AS bkt
              FROM documents)
            SELECT doc_id, lang,
                   CAST(CASE WHEN bkt < (CASE lang WHEN 'en' THEN 100000
                                         WHEN 'de' THEN 250000
                                         ELSE 20000 END)
                        THEN 1 ELSE 0 END AS BIGINT) AS in_smaller
            FROM b
            WHERE bkt < (CASE lang WHEN 'en' THEN 200000
                         WHEN 'de' THEN 500000 ELSE 50000 END)
        """,
        # shadow strip mock closed forms (s2_shadow_strip_bands widths
        # a=6+(i%3)*2, c=4+(i%4)*2, d=4+(i%5)*2, e=4+(i%2)*2, w=a+c+d+e+12,
        # h=20): shadow == dark LAND strip (water SCL=6 excluded for SR);
        # qa morphology erodes 2 px then dilates 5 px -> contiguous
        # combined strips grow by 6; a width-4 cloud erodes away entirely
        "s2_shadow_params": f"""
            WITH p AS (
              SELECT i,
                     6 + (i % 3) * 2 AS a, 4 + (i % 4) * 2 AS c,
                     4 + (i % 5) * 2 AS d, 4 + (i % 2) * 2 AS e
              FROM range(0, {min(n, 240)}) t(i))
            SELECT CAST(i AS BIGINT) AS image_id,
                   CAST(20 * (a + c + d + e + 12) AS BIGINT) AS fill_px,
                   CAST(20 * c AS BIGINT) AS cloud_px,
                   CAST(20 * d AS BIGINT) AS shadow_px,
                   CAST(20 * (a + e + 6) AS BIGINT) AS cloudless_px,
                   CAST(20 * (a + d + e + 12
                        - (CASE WHEN c = 4 THEN -c ELSE 6 END))
                     AS BIGINT) AS cloudless_dark10_px,
                   CAST(60 AS BIGINT) AS shadow_sd30_px,
                   CAST(20 * (a + d + e + 3) AS BIGINT) AS cloudless_sd30_px,
                   CAST(20 * (d + e) AS BIGINT) AS shadow_toa_px,
                   CAST(20 * (a + d + e + 12
                        - (CASE WHEN c = 4 THEN -c ELSE 6 END))
                     AS BIGINT) AS cloudless_nsh_px
            FROM p
        """,
        # 2x nearest decimation closed form: sampled pixels are the odd
        # rows/cols (target centre j -> source 2j+0.5 -> nearest 2j+1);
        # f_px=(i%5)*4 and c_px=(i%7)*2 are even, so the surviving odd-col
        # counts are 20-(i%5)*2 (band 0, past the fill strip) and i%7
        # (QA, inside the cloud strip); 20 sampled rows
        "reproject_export": f"""
            SELECT printf('IMG/%08d', i) AS image_id,
                   CAST(20 AS BIGINT) AS out_h,
                   CAST(20 AS BIGINT) AS out_w,
                   CAST(20.0 AS DOUBLE) AS xscale,
                   CAST(((i % 200) + 1) * 20 * (20 - (i % 5) * 2) AS BIGINT)
                     AS b0_sum,
                   CAST((CASE WHEN i % 3 = 2 THEN 1024 ELSE 512 END)
                        * 20 * (i % 7) AS BIGINT) AS qa_sum
            FROM range(0, {n}) t(i)
            WHERE i % 4 <> 3
        """,
        # structured-view band sums: B1 sums v over the non-fill columns,
        # the QA field sums the family cloud bit over the cloud strip
        "numpy_roundtrip": f"""
            SELECT printf('IMG/%08d', i) AS image_id,
                   CAST(((i % 200) + 1) * 40 * (40 - (i % 5) * 4) AS BIGINT)
                     AS b1_sum,
                   CAST((CASE WHEN i % 3 = 2 THEN 1024 ELSE 512 END)
                        * 40 * ((i % 7) * 2) AS BIGINT) AS qa_sum
            FROM range(0, {min(n, 240)}) t(i)
            WHERE i % 4 <> 3
        """,
        # committed-rows closed form: raw images per collection family;
        # the resume anti-join against a fully-committed table is empty
        "snapshot_commit": f"""
            SELECT CASE i % 3
                     WHEN 0 THEN 'MOCK/CONST'
                     WHEN 1 THEN 'LANDSAT/LC09/C02/T1_L2'
                     ELSE 'COPERNICUS/S2_SR_HARMONIZED'
                   END AS collection,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(0 AS BIGINT) AS n_pending
            FROM range(0, {min(n, 400)}) t(i)
            WHERE i % 4 <> 3
            GROUP BY 1
        """,
        # bestEffort stride-2 closed form: sampled grid is 576x576; the
        # even strip widths halve exactly under the stride
        "best_effort_portions": f"""
            SELECT CAST(i AS INT) AS i, CAST(2 AS INT) AS stride,
                   CAST(576 * 576 AS BIGINT) AS total_px,
                   CAST(576 * (576 - ((i % 5) * 4) / 2) AS BIGINT)
                     AS fill_px,
                   CAST(576 * (576 - ((i % 5) * 4) / 2
                               - ((i % 7) * 2) / 2) AS BIGINT)
                     AS cloudless_px
            FROM range(0, {min(n, 48)}) t(i)
        """,
        # strip closed form of the band-split transpose: per surviving
        # image (raw, non-S2), band B1 sums v over the non-fill columns
        # and QA_PIXEL sums bit-9 over the cloud strip
        "split_bands": f"""
            WITH imgs AS (
              SELECT i, (i % 200) + 1 AS v,
                     (i % 5) * 4 AS f_px, (i % 7) * 2 AS c_px
              FROM range(0, {min(n, 300)}) t(i)
              WHERE i % 3 <> 2 AND i % 4 <> 3)
            SELECT 'B1' AS band,
                   CAST(COUNT(*) AS INT) AS n_images,
                   CAST(40 AS INT) AS h, CAST(40 AS INT) AS w,
                   CAST(SUM(v * 40 * (40 - f_px)) AS BIGINT) AS px_sum
            FROM imgs
            UNION ALL
            SELECT 'QA_PIXEL',
                   CAST(COUNT(*) AS INT),
                   CAST(40 AS INT), CAST(40 AS INT),
                   CAST(SUM(512 * 40 * c_px) AS BIGINT)
            FROM imgs
        """,
        # BRUTE-FORCE twin of the banded phash join: every (a < b) pair
        # with bit_count(xor) <= 2 — equality with the banded engine
        # output is simultaneously a completeness proof of the pigeonhole
        # banding (no pair at distance <= max_hamming can miss every band)
        "phash_near_dup": """
            WITH base AS (
              SELECT doc_id,
                     CAST(CONCAT('0x', SUBSTR(md5(text), 1, 15)) AS BIGINT)
                       AS phash
              FROM documents WHERE doc_id < 2000),
            allr AS (
              SELECT doc_id, phash FROM base
              UNION ALL
              SELECT doc_id + 500000,
                     xor(phash,
                         (CAST(1 AS BIGINT) << CAST(doc_id % 59 AS INT)))
              FROM base WHERE doc_id < 40),
            pairs AS (
              SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                     a.phash AS pa, b.phash AS pb,
                     bit_count(xor(a.phash, b.phash)) AS hd
              FROM allr a JOIN allr b ON a.doc_id < b.doc_id)
            SELECT doc_id_a, doc_id_b,
                   CAST((CASE WHEN ((pa >> 0) & 255) = ((pb >> 0) & 255) THEN 1 ELSE 0 END)
                      + (CASE WHEN ((pa >> 8) & 255) = ((pb >> 8) & 255) THEN 1 ELSE 0 END)
                      + (CASE WHEN ((pa >> 16) & 255) = ((pb >> 16) & 255) THEN 1 ELSE 0 END)
                      + (CASE WHEN ((pa >> 24) & 255) = ((pb >> 24) & 255) THEN 1 ELSE 0 END)
                      + (CASE WHEN ((pa >> 32) & 255) = ((pb >> 32) & 255) THEN 1 ELSE 0 END)
                      + (CASE WHEN ((pa >> 40) & 255) = ((pb >> 40) & 255) THEN 1 ELSE 0 END)
                      + (CASE WHEN ((pa >> 48) & 255) = ((pb >> 48) & 255) THEN 1 ELSE 0 END)
                      + (CASE WHEN ((pa >> 56) & 255) = ((pb >> 56) & 255) THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_shared_bands,
                   CAST(hd AS BIGINT) AS hamming
            FROM pairs WHERE hd <= 2
        """,
        # identical md5(text) dup keys (NULL text -> the same \x00NULL
        # sentinel) and double divisions; per-source 2-phase agg replay
        "domain_stats": """
            SELECT COALESCE(source, '') AS source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                   CAST(COUNT(DISTINCT md5(COALESCE(text, chr(0) || 'NULL')))
                        AS BIGINT) AS n_unique_texts,
                   CAST(round(1.0
                        - COUNT(DISTINCT md5(COALESCE(text, chr(0) || 'NULL')))
                          / CAST(COUNT(*) AS DOUBLE), 6)
                        AS DOUBLE) AS dup_ratio,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(round(AVG(n_chars), 6) AS DOUBLE) AS mean_chars
            FROM documents GROUP BY 1
        """,
        # exact integer cell keys + integer-second lag gaps; the window
        # is partitioned by the cell in both engines
        "revisit_stats": f"""
            WITH img AS ({synth.sql_images(n)}),
            base AS (
              SELECT CAST(FLOOR(x0 / 10000.0) AS BIGINT) AS cell_x,
                     CAST(FLOOR(y0 / 10000.0) AS BIGINT) AS cell_y,
                     image_id,
                     CAST(epoch(time_start) AS BIGINT) AS ts_s
              FROM img),
            g AS (
              SELECT cell_x, cell_y,
                     ts_s - lag(ts_s) OVER (PARTITION BY cell_x, cell_y
                                            ORDER BY ts_s, image_id) AS gap_s
              FROM base)
            SELECT cell_x, cell_y,
                   CAST(COUNT(*) AS BIGINT) AS n_images,
                   CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
                   CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
                   CAST(COALESCE(SUM(gap_s), 0) AS BIGINT) AS sum_gap_s,
                   CAST(round(CASE WHEN COUNT(gap_s) > 0
                        THEN CAST(SUM(gap_s) AS DOUBLE) / COUNT(gap_s)
                        ELSE 0.0 END, 6) AS DOUBLE) AS mean_gap_s
            FROM g GROUP BY 1, 2
        """,
        # same quantised buckets as label_noise; label-mismatch filter
        # BEFORE the rank; round(cos,6) + nbr_id tiebreak
        "hard_negatives": f"""
            WITH emb AS (
              SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings),
            qemb AS (
              SELECT vec_id, label, e,
                     list_transform(e, x -> CAST(FLOOR(x * 4096.0)
                       AS BIGINT)) AS qv
              FROM emb),
            bkt AS (SELECT vec_id, label, e, {_lsh_bucket_sql()} AS bucket
                    FROM qemb),
            sims AS (
              SELECT a.vec_id, a.label,
                     b.vec_id AS nbr_id, b.label AS nbr_label,
                     round(list_dot_product(a.e, b.e)
                       / NULLIF(sqrt(list_dot_product(a.e, a.e))
                                * sqrt(list_dot_product(b.e, b.e)), 0),
                       6) AS sim
              FROM bkt a JOIN bkt b
                ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
                   AND a.label <> b.label)
            SELECT vec_id, label, CAST(rank AS INT) AS rank,
                   nbr_id, nbr_label, sim
            FROM (
              SELECT vec_id, label, nbr_id, nbr_label, sim,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY sim DESC, nbr_id) AS rank
              FROM sims WHERE sim IS NOT NULL)
            WHERE rank <= 3
        """,
        # identical lowercase-alpha terms; the rank uses only exact
        # integer keys (tf DESC, df ASC, term ASC) — the rounded ln()
        # score is a value column, never a sort key
        "tfidf_terms": r"""
            WITH ex AS (
              SELECT doc_id, unnest(list_filter(
                       regexp_split_to_array(lower(COALESCE(text, '')),
                                             '[^a-z]+'), x -> x <> '')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM ex GROUP BY 1, 2),
            dfx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                    FROM tf GROUP BY 1),
            nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
            SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df,
                   CAST(round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6)
                        AS DOUBLE) AS score
            FROM (
              SELECT tf.doc_id, tf.term, tf.tf, dfx.df, nd.n_docs,
                     ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, dfx.df ASC, tf.term ASC) AS rank
              FROM tf JOIN dfx USING (term), nd)
            WHERE rank <= 3
        """,
        # same derived test dims (pure functions of i) and exact
        # integer cross-multiplied aspect rule; funnel counts per fmt
        "image_gate": f"""
            WITH img AS ({synth.sql_images(n)}),
            v AS (
              SELECT fmt, caption,
                     CAST(16 + i % 48 AS BIGINT) AS w,
                     CAST(16 + (i * 7) % 48 AS BIGINT) AS h
              FROM img),
            g AS (
              SELECT fmt,
                     (LEAST(w, h) >= 24) AS ok_dim,
                     (GREATEST(w, h) * 1 <= LEAST(w, h) * 2) AS ok_aspect,
                     (length(COALESCE(caption, '')) >= 5) AS ok_caption,
                     (fmt IN ('raw')) AS ok_fmt
              FROM v)
            SELECT fmt,
                   CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(SUM(CASE WHEN ok_dim THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_ok_dim,
                   CAST(SUM(CASE WHEN ok_aspect THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_ok_aspect,
                   CAST(SUM(CASE WHEN ok_caption THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_ok_caption,
                   CAST(SUM(CASE WHEN ok_fmt THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_ok_fmt,
                   CAST(SUM(CASE WHEN ok_dim AND ok_aspect AND ok_caption
                                      AND ok_fmt THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_keep
            FROM g GROUP BY 1
        """,
        # DuckDB's NATIVE ASOF JOIN is the oracle for the engine's
        # tag/union/keyed-running-last implementation — an independent
        # algorithm computing the same nearest-predecessor relation
        "asof_join": """
            WITH v AS (
              SELECT user_id, ts, CAST(MAX(event_id) AS BIGINT) AS view_id
              FROM events WHERE event_type = 'view' GROUP BY 1, 2),
            p AS (
              SELECT event_id, user_id, ts
              FROM events WHERE event_type = 'purchase')
            SELECT p.event_id, p.user_id,
                   epoch_us(p.ts) AS ts_us,
                   epoch_us(v.ts) AS view_ts_us,
                   v.view_id AS view_id,
                   epoch_us(p.ts) - epoch_us(v.ts) AS delay_us
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND p.ts >= v.ts
        """,
        # the analytic recipe partition: pixels are a pure function of
        # (v, f_px, c_px, w, h, fmt) plus WHICH QA bit fires (i%3==2 ->
        # QA60 bit 10, else QA_PIXEL bit 9 — only when c_px > 0, synth.py
        # _gen_bytes_batch); Spark groups by md5(real bytes) — the value
        # match proves the byte path realises exactly this partition
        "image_exact_dup": f"""
            WITH img AS ({synth.sql_images(n)})
            SELECT CAST(COUNT(*) AS BIGINT) AS n_images,
                   CAST(COUNT(DISTINCT caption) AS BIGINT) AS n_captions,
                   MIN(image_id) AS rep_image_id
            FROM img
            GROUP BY v, f_px, c_px, w, h, fmt,
                     CASE WHEN c_px > 0 THEN CAST(i % 3 = 2 AS INT)
                          ELSE -1 END
        """,
        # exact bbox-intersect join (the cover join's refine makes the
        # engine result res-independent) + month distinct counts;
        # coverage as exact integer permille
        "roi_coverage": f"""
            WITH img AS ({synth.sql_images(n)}),
            roi AS ({synth.sql_rois(m)}),
            pairs AS (
              SELECT DISTINCT img.image_id, roi.roi_id
              FROM img JOIN roi
                ON img.x0 <= roi.rx1 AND roi.rx0 <= img.x1
               AND img.y0 <= roi.ry1 AND roi.ry0 <= img.y1),
            dated AS (
              SELECT p.roi_id, date_trunc('month', i.time_start) AS month
              FROM pairs p JOIN img i USING (image_id)),
            tot AS (
              SELECT CAST(COUNT(DISTINCT date_trunc('month', time_start))
                          AS BIGINT) AS total_months FROM img)
            SELECT roi_id,
                   CAST(COUNT(*) AS BIGINT) AS n_images,
                   CAST(COUNT(DISTINCT month) AS BIGINT) AS n_months,
                   total_months,
                   CAST(COUNT(DISTINCT month) * 1000 // total_months
                        AS BIGINT) AS coverage_permille
            FROM dated, tot GROUP BY roi_id, total_months
        """,
        # identical integer alpha-permille score, k = (p*n+999) DIV 1000
        # per group, cut = max score whose desc-cumulative count >= k,
        # ties at the cut kept — a pure filter in both engines
        "quality_prune": r"""
            WITH scored AS (
              SELECT doc_id, lang AS grp,
                     CAST(CASE WHEN length(COALESCE(text, '')) > 0
                          THEN CAST(length(regexp_replace(
                                 COALESCE(text, ''), '[^a-zA-Z]', '', 'g'))
                               AS BIGINT) * 1000
                               // length(COALESCE(text, ''))
                          ELSE 0 END AS BIGINT) AS score
              FROM documents),
            hist AS (SELECT grp, score, CAST(COUNT(*) AS BIGINT) AS c
                     FROM scored GROUP BY 1, 2),
            cum AS (
              SELECT grp, score, c,
                     SUM(c) OVER (PARTITION BY grp ORDER BY score DESC
                                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM hist),
            tot AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n_grp
                    FROM hist GROUP BY 1),
            cuts AS (
              SELECT cum.grp, tot.n_grp,
                     CAST(MAX(score) AS BIGINT) AS cut
              FROM cum JOIN tot USING (grp)
              WHERE cum.cum >= (400 * tot.n_grp + 999) // 1000
              GROUP BY 1, 2)
            SELECT s.doc_id, s.grp AS lang, s.score, c.cut,
                   c.n_grp AS n_group_docs
            FROM scored s JOIN cuts c ON s.grp = c.grp
            WHERE s.score >= c.cut
        """,
        # full cross-table MinHash-LSH replay: same shingle hash / A,B
        # rows / band md5 as lsh_ctes on BOTH chains, exact Jaccard
        # verify, integer cross-multiplied verdict
        "fuzzy_decontam": f"""
            WITH bench AS (
              SELECT doc_id + 900000 AS bench_id,
                     substr(text, 1, greatest(length(text) - 3, 1)) AS text
              FROM documents WHERE doc_id % 50 = 0),
            dsh AS (SELECT doc_id, {minhash_shingle} AS sh FROM documents),
            dsig AS (
              SELECT doc_id, [{', '.join(
                  f'list_min(list_transform(sh, h -> ({dedup._A[i]} * h '
                  f'+ {dedup._B[i]}) % 2147483647))' for i in range(16))}] AS sig
              FROM dsh),
            dband AS (
              SELECT doc_id, b,
                     md5(array_to_string(sig[b*4 + 1 : b*4 + 4], ',')) AS bhash
              FROM dsig, (SELECT unnest([0, 1, 2, 3]) AS b)),
            bsh AS (SELECT bench_id, {minhash_shingle} AS sh FROM bench),
            bsig AS (
              SELECT bench_id, [{', '.join(
                  f'list_min(list_transform(sh, h -> ({dedup._A[i]} * h '
                  f'+ {dedup._B[i]}) % 2147483647))' for i in range(16))}] AS sig
              FROM bsh),
            bband AS (
              SELECT bench_id, b,
                     md5(array_to_string(sig[b*4 + 1 : b*4 + 4], ',')) AS bhash
              FROM bsig, (SELECT unnest([0, 1, 2, 3]) AS b)),
            cand AS (
              SELECT DISTINCT d.doc_id, bb.bench_id
              FROM dband d JOIN bband bb USING (b, bhash)),
            dsets AS (
              SELECT doc_id,
                     list_distinct([substr(text, i, 5)
                       FOR i IN range(1, greatest(length(text)-4, 1) + 1)]) AS s
              FROM documents),
            bsets AS (
              SELECT bench_id,
                     list_distinct([substr(text, i, 5)
                       FOR i IN range(1, greatest(length(text)-4, 1) + 1)]) AS s
              FROM bench)
            SELECT c.doc_id, c.bench_id,
                   CAST(len(list_filter(sa.s, x -> list_contains(sb.s, x)))
                        AS BIGINT) AS n_intersect,
                   CAST(len(sa.s) + len(sb.s)
                        - len(list_filter(sa.s, x -> list_contains(sb.s, x)))
                        AS BIGINT) AS n_union,
                   (1000 * len(list_filter(sa.s, x -> list_contains(sb.s, x)))
                    >= 500 * (len(sa.s) + len(sb.s)
                       - len(list_filter(sa.s, x -> list_contains(sb.s, x)))))
                     AS contaminated
            FROM cand c JOIN dsets sa USING (doc_id)
                        JOIN bsets sb USING (bench_id)
        """,
        # exact IEEE replay: x*127 exact for float32 inputs, correctly
        # rounded division, unambiguous floor; errors in 1e-9 integer
        # units via the same correctly-rounded ops
        "quantize_embed": """
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings),
            m AS (SELECT vec_id, e,
                         list_max(list_transform(e, x -> abs(x))) AS mx
                  FROM e),
            q AS (
              SELECT vec_id, e, mx,
                     CASE WHEN mx > 0
                          THEN list_transform(e,
                                 x -> CAST(floor(x * 127.0 / mx) AS BIGINT))
                          ELSE list_transform(e, x -> CAST(0 AS BIGINT))
                     END AS qv,
                     CASE WHEN mx > 0 THEN mx / 127.0 ELSE 0.0 END AS scale
              FROM m)
            SELECT vec_id,
                   CAST(len(qv) AS BIGINT) AS n_dims,
                   CAST(list_sum(qv) AS BIGINT) AS q_sum,
                   CAST(list_min(qv) AS BIGINT) AS q_min,
                   CAST(list_max(qv) AS BIGINT) AS q_max,
                   CAST(len(list_filter(qv, x -> x <> 0)) AS BIGINT) AS nnz,
                   CAST(floor(list_max(
                     [abs(e[i] - qv[i] * scale) FOR i IN range(1, len(e) + 1)]
                   ) * 1e9) AS BIGINT) AS max_err_1e9
            FROM q
        """,
        # brute-force pair graph (the pigeonhole-banding completeness
        # proof) resolved with the recursive min-label CTE — singletons
        # label themselves
        "phash_components": """
            WITH RECURSIVE base AS (
              SELECT doc_id,
                     CAST(CONCAT('0x', SUBSTR(md5(text), 1, 15)) AS BIGINT)
                       AS phash
              FROM documents WHERE doc_id < 2000),
            allr AS (
              SELECT doc_id, phash FROM base
              UNION ALL
              SELECT doc_id + 500000,
                     xor(phash,
                         (CAST(1 AS BIGINT) << CAST(doc_id % 59 AS INT)))
              FROM base WHERE doc_id < 40),
            pairs AS (
              SELECT a.doc_id AS pa, b.doc_id AS pb
              FROM allr a JOIN allr b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.phash, b.phash)) <= 2),
            edges AS (
              SELECT pa AS a, pb AS bb FROM pairs
              UNION ALL SELECT pb, pa FROM pairs),
            reach(id, comp) AS (
              SELECT doc_id, doc_id FROM allr
              UNION
              SELECT e.bb, r.comp FROM reach r JOIN edges e ON e.a = r.id
              WHERE r.comp < e.bb)
            SELECT id AS doc_id, CAST(MIN(comp) AS BIGINT) AS component
            FROM reach GROUP BY id
        """,
        # identical stride/ceil arithmetic and substring slices;
        # empty docs emit no chunks in both engines
        "chunk_documents": """
            WITH base AS (
              SELECT doc_id, COALESCE(text, '') AS t,
                     length(COALESCE(text, '')) AS n
              FROM documents),
            counted AS (
              SELECT doc_id, t,
                     CASE WHEN n > 0
                          THEN CAST(ceil(CAST(greatest(n - 50, 0) AS DOUBLE)
                                         / 150) AS INT)
                          ELSE 0 END AS n_chunks
              FROM base),
            ex AS (
              SELECT doc_id, t,
                     unnest([i FOR i IN range(0, n_chunks)]) AS chunk_idx
              FROM counted WHERE n_chunks > 0)
            SELECT doc_id,
                   CAST(chunk_idx AS INT) AS chunk_idx,
                   substr(t, chunk_idx * 150 + 1, 200) AS chunk_text,
                   CAST(chunk_idx * 150 AS BIGINT) AS chunk_start,
                   CAST(length(substr(t, chunk_idx * 150 + 1, 200))
                        AS BIGINT) AS chunk_chars
            FROM ex
        """,
        # same centre/d2 doubles (each step correctly rounded, fixed
        # order), same (d2, roi_id) tie rule via rank
        "nearest_roi": f"""
            WITH img AS ({synth.sql_images(n)}),
            roi AS ({synth.sql_rois(m)}),
            d AS (
              SELECT img.image_id, roi.roi_id,
                     ((img.x0 + img.x1)/2 - (roi.rx0 + roi.rx1)/2)
                       * ((img.x0 + img.x1)/2 - (roi.rx0 + roi.rx1)/2)
                     + ((img.y0 + img.y1)/2 - (roi.ry0 + roi.ry1)/2)
                       * ((img.y0 + img.y1)/2 - (roi.ry0 + roi.ry1)/2)
                       AS d2
              FROM img, roi)
            SELECT image_id, roi_id,
                   CAST(round(d2, 6) AS DOUBLE) AS d2
            FROM (
              SELECT image_id, roi_id, d2,
                     ROW_NUMBER() OVER (PARTITION BY image_id
                       ORDER BY d2, roi_id) AS r
              FROM d) WHERE r = 1
        """,
        # strip-world closed form: band 0 is v everywhere except the
        # f_px fill columns (0); a value match proves the decode +
        # np.unique path against the recipe
        "band_histogram": f"""
            WITH img AS ({synth.sql_images(n)}),
            raw AS (SELECT * FROM img WHERE fmt = 'raw')
            SELECT image_id, CAST(0 AS BIGINT) AS value,
                   CAST(f_px * h AS BIGINT) AS n_px
            FROM raw WHERE f_px > 0
            UNION ALL
            SELECT image_id, CAST(v AS BIGINT) AS value,
                   CAST((w - f_px) * h AS BIGINT) AS n_px
            FROM raw
        """,
        # ISO-Monday week truncation in both engines; offsets as exact
        # integer epoch-second arithmetic
        "cohort_retention": """
            WITH ev AS (
              SELECT user_id, date_trunc('week', ts) AS week FROM events),
            first AS (
              SELECT user_id, MIN(week) AS cohort_week
              FROM ev GROUP BY 1),
            active AS (SELECT DISTINCT user_id, week FROM ev)
            SELECT CAST(epoch(cohort_week) AS BIGINT) AS cohort_week_s,
                   CAST((epoch(week) - epoch(cohort_week)) // 604800
                        AS BIGINT) AS week_offset,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM active JOIN first USING (user_id)
            GROUP BY 1, 2
        """,
    }
    # the streaming near-dup drain must equal the batch LSH join exactly
    # (same signature/band hashes via dedup.banded_sigs; cap never hit at
    # oracle scales) — one SQL text, two execution models under test
    sql["stream_near_dup"] = sql["minhash_lsh_pairs"]
    return sql
