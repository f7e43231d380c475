"""WebDataset-style tar shard sink/source for image+caption corpora.

The standard deliverable of large multimodal training pipelines
(img2dataset -> WebDataset -> sequential-read dataloaders): samples are
grouped into fixed-count tar shards, each sample a key with one tar member
per modality — ``{key}.img`` (opaque encoded bytes), ``{key}.txt``
(caption), ``{key}.json`` (typed metadata).  Shard membership is the
repo's portable content-hash rule (``sampling.hash_bucket`` — md5 of
key+salt), so the layout is a pure function of content: re-running the
export on a repartitioned/compacted source produces byte-identical
shards, and an external engine can predict every sample's shard.

Reference analog: geedim's on-disk deliverable is per-image GeoTIFFs
(download.py BaseImage.toGeoTIFF / cli.py download --download-dir); this
sink is the corpus-scale equivalent the training-data pipeline needs —
10^12 samples cannot live as 10^12 files, they live as ~10^6 tar shards
streamed sequentially by dataloader workers.

Scale shape: one shuffle (hash repartition on the shard id), then each
shard is written by exactly one task via ``applyInPandas`` — no driver
collect, no cross-shard coordination.  Size shards via ``n_shards`` so a
shard is O(100 MB–1 GB) at the target corpus (WebDataset's own guidance);
tar bytes are deterministic (sorted keys, zeroed ustar headers) so shard
sha256s double as end-to-end integrity checks in the manifest.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geedim_spark.operators.sampling import hash_bucket

MANIFEST_SCHEMA = (
    "shard long, n_samples long, n_data_bytes long, tar_sha256 string, "
    "path string"
)
_SAMPLE_SCHEMA = (
    "shard long, key string, data binary, caption string, meta string"
)


def shard_of(key, n_shards: int, salt: str = "wds-v1"):
    """Deterministic shard id in [0, n_shards): the portable md5 bucket
    (``sampling.hash_bucket`` % n_shards) — layout/engine-independent."""
    return (hash_bucket(key, salt) % F.lit(n_shards)).cast("long")


def _tar_bytes(rows: list[dict]) -> bytes:
    """One deterministic tar: keys sorted, ustar format, zeroed headers
    (mtime/uid/gid/uname/gname) so identical samples => identical bytes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for r in sorted(rows, key=lambda r: r["key"]):
            key = str(r["key"]).replace("/", "_")
            for ext, payload in (
                ("img", bytes(r["data"]) if r["data"] is not None else b""),
                ("txt", (r["caption"] or "").encode("utf-8")),
                ("json", r["meta"].encode("utf-8")),
            ):
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def write_wds_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 64,
    key_col: str = "image_id",
    data_col: str = "bytes",
    caption_col: str = "caption",
    meta_cols: tuple[str, ...] = ("w", "h", "fmt"),
    salt: str = "wds-v1",
    overwrite: bool = False,
) -> DataFrame:
    """Write ``df`` as deterministic WebDataset tar shards; return the
    manifest DataFrame (shard, n_samples, n_data_bytes, tar_sha256, path).

    The manifest is also persisted under ``out_dir/_manifest`` so a later
    reader (or resume logic) can verify shard integrity without re-hashing.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    os.makedirs(out_dir, exist_ok=True)
    existing = [p for p in os.listdir(out_dir)
                if p.startswith("shard-") and p.endswith(".tar")]
    if existing:
        if not overwrite:
            raise FileExistsError(
                f"{out_dir} already holds {len(existing)} shard tars; "
                "pass overwrite=True to replace them"
            )
        for p in existing:
            os.unlink(os.path.join(out_dir, p))

    meta_expr = F.to_json(F.struct(*[F.col(c) for c in meta_cols]))
    samples = df.select(
        shard_of(F.col(key_col), n_shards, salt).alias("shard"),
        F.col(key_col).cast("string").alias("key"),
        F.col(data_col).alias("data"),
        F.col(caption_col).cast("string").alias("caption"),
        meta_expr.alias("meta"),
    )

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        rows = pdf.to_dict("records")
        tar = _tar_bytes(rows)
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(tar)
        os.replace(tmp, path)  # atomic publish on the same filesystem
        return pd.DataFrame([{
            "shard": shard,
            "n_samples": len(rows),
            "n_data_bytes": int(sum(
                len(r["data"]) if r["data"] is not None else 0 for r in rows
            )),
            "tar_sha256": hashlib.sha256(tar).hexdigest(),
            "path": path,
        }])

    manifest = (
        samples.repartition(n_shards, "shard")
        .groupBy("shard")
        .applyInPandas(_write, schema=MANIFEST_SCHEMA)
    )
    # one small action materialises the shards; the manifest itself is tiny
    # (n_shards rows) so a parquet copy beside the tars is cheap
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "_manifest"))
    return df.sparkSession.read.parquet(os.path.join(out_dir, "_manifest"))


def read_wds_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Stream tar shards back to rows (shard, key, data, caption, meta).

    ``binaryFile`` scan of the shard tars -> Arrow-batched tar parse; each
    task holds one tar in memory (the same bound the writer chose).  The
    '/'->'_' key sanitisation of the writer is not reversed — keys are
    identifiers, and the sanitised form is what the tar IS."""

    def _parse(it):
        for pdf in it:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = int(os.path.basename(path)[len("shard-"):-len(".tar")])
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    cur: dict[str, dict] = {}
                    for m in tf.getmembers():
                        key, ext = m.name.rsplit(".", 1)
                        cur.setdefault(key, {})[ext] = tf.extractfile(m).read()
                    for key, parts in cur.items():
                        out.append({
                            "shard": shard,
                            "key": key,
                            "data": parts.get("img", b""),
                            "caption": parts.get("txt", b"").decode("utf-8"),
                            "meta": parts.get("json", b"{}").decode("utf-8"),
                        })
            yield pd.DataFrame(
                out, columns=["shard", "key", "data", "caption", "meta"]
            )

    tars = spark.read.format("binaryFile").load(
        os.path.join(out_dir, "shard-*.tar")
    )
    return tars.select("path", "content").mapInPandas(
        _parse, schema=_SAMPLE_SCHEMA
    )


def verify_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    """Integrity check: re-hash every shard tar on executors and compare
    with the committed manifest.  Returns (shard, ok) — a reader can gate
    on ``ok`` before trusting a shard (bit-rot / partial-copy detection)."""
    manifest = spark.read.parquet(os.path.join(out_dir, "_manifest"))
    tars = spark.read.format("binaryFile").load(
        os.path.join(out_dir, "shard-*.tar")
    )

    def _hash(it):
        for pdf in it:
            yield pd.DataFrame({
                "path": pdf["path"].map(
                    lambda p: p[len("file:"):] if p.startswith("file:") else p
                ),
                "actual_sha256": pdf["content"].map(
                    lambda c: hashlib.sha256(bytes(c)).hexdigest()
                ),
            })

    hashed = tars.select("path", "content").mapInPandas(
        _hash, schema="path string, actual_sha256 string"
    )
    return manifest.join(hashed, "path", "left").select(
        "shard",
        (F.col("actual_sha256") == F.col("tar_sha256")).alias("ok"),
    )
