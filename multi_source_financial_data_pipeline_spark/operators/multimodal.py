"""Multimodal column plumbing (north star: BASELINE.json — image/audio/video
as opaque binary columns with typed metadata).

The Spark-side design is fully real: explicit schemas, ``mapInPandas`` with
Arrow-batched pandas DataFrames, per-partition batching, and deterministic
output shapes — only the codec calls are stubbed, because the image/audio
libraries are not in this container. ``decode_media_features`` uses a
deterministic fake decoder by default (so tests pin the plumbing end-to-end);
passing ``require_codecs=True`` raises NotImplementedError at the exact
boundary where PIL/ffmpeg would plug in.

Scale notes: binary payloads ride in parquet as byte arrays; keep
``spark.sql.files.maxPartitionBytes`` low enough that a partition of blobs
fits executor memory, and never collect the binary column. Feature extraction
is embarrassingly parallel over partitions; the Arrow transfer is the only
Python boundary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

#: Opaque media rows: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media blobs: repeated md5 bytes, kind round-robin,
    metadata map — generated JVM-side at any scale."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.unhex(F.repeat(F.md5(F.concat(F.lit(seed), F.col("id"))), 8)).alias("data"),
        F.create_map(
            F.lit("source"), F.concat(F.lit("cam-"), (F.col("id") % 5)),
            F.lit("codec"), F.lit("fake/v1"),
        ).alias("meta"),
    )


def _fake_decode(data: bytes | None) -> tuple[int | None, int | None, list[float]]:
    """Deterministic stand-in for a codec: dimensions + an 8-dim feature from
    the payload digest (md5 over the lowercase hex of the payload, so a SQL
    oracle lacking blob-md5 can reproduce it). Swap for PIL.Image.open /
    librosa / ffmpeg here."""
    if data is None:
        return None, None, []
    digest = hashlib.md5(bytes(data).hex().encode()).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [b / 255.0 for b in digest[2:10]]
    return width, height, feature


def decode_media_features(
    df: DataFrame, batch_size: int = 256, require_codecs: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. The pandas
    iterator shape (schema in == MEDIA_SCHEMA, schema out == FEATURE_SCHEMA,
    multiple batches per partition) is the production plumbing; only
    `_fake_decode` is a stub."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if require_codecs:
            raise NotImplementedError(
                "real media codecs (PIL/ffmpeg) are not available in this "
                "environment; deterministic fake decode is the default"
            )
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                decoded = [_fake_decode(d) for d in chunk["data"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "kind": chunk["kind"].to_numpy(),
                        "n_bytes": [
                            len(d) if d is not None else None for d in chunk["data"]
                        ],
                        "width": [w for w, _, _ in decoded],
                        "height": [h for _, h, _ in decoded],
                        "feature": [f for _, _, f in decoded],
                    }
                )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("data", T.BinaryType(), True),
    ]
)


def resize_media(
    df: DataFrame, max_side: int = 128, require_codecs: bool = False
) -> DataFrame:
    """Resize stub with real plumbing: decode dimensions (fake codec), scale
    the longer side down to ``max_side`` preserving aspect ratio, and emit a
    payload whose size shrinks proportionally (byte truncation stands in for
    re-encoding). A real implementation swaps the body for
    PIL.Image.thumbnail + re-encode; the Spark-side contract (schema,
    Arrow batching, binary passthrough) is what's under test."""

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if require_codecs:
            raise NotImplementedError(
                "real image codecs (PIL) are not available in this "
                "environment; deterministic fake resize is the default"
            )
        for pdf in batches:
            widths, heights, blobs = [], [], []
            for d in pdf["data"]:
                w, h, _ = _fake_decode(d)
                if w is None:
                    widths.append(None), heights.append(None), blobs.append(None)
                    continue
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                keep = max(1, int(len(d) * (nw * nh) / (w * h)))
                widths.append(nw), heights.append(nh)
                blobs.append(bytes(d)[:keep])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "width": widths,
                    "height": heights,
                    "data": blobs,
                }
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """Video frame sampling stub with real explode plumbing: one output row
    per sampled 'frame' (here: every_n_bytes-sized slice of the payload).
    A real implementation swaps the slicer for a keyframe decoder."""

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for _, row in pdf.iterrows():
                data = row["data"]
                if data is None or row["kind"] != "video":
                    continue
                data = bytes(data)
                for i, start in enumerate(range(0, len(data), every_n_bytes)):
                    out_ids.append(row["media_id"])
                    out_idx.append(i)
                    out_bytes.append(data[start : start + every_n_bytes])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_index": out_idx, "frame_bytes": out_bytes}
            )

    return df.mapInPandas(frames, schema=FRAME_SCHEMA)
