"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct -- the reference does the same for BLOBs (hex-encoded buffers,
/root/reference/src/YADAMU/file/node/jsonWriter.js:22-26, decoded by
/root/reference/src/YADAMU/common/hexBinToBinary.js:10-14). The
Spark-side plumbing (schema, Arrow batch shape, ``mapInPandas``
signature, partitioning) is real and tested; the codec step is STUBBED
because this container ships no image/audio libraries:

- ``decode_image_meta`` uses a deterministic fake decoder (dimensions
  derived from the payload hash) so tests exercise the full path;
- ``decode_image_real`` raises NotImplementedError unless PIL is
  importable -- the one line to swap in production.

Scale: mapInPandas streams Arrow batches; decoding is per-row CPU work
that parallelizes perfectly, so the only knobs that matter are input
split size (spark.sql.files.maxPartitionBytes) and batch size
(spark.sql.execution.arrow.maxRecordsPerBatch) -- binary payloads are
large, so lower both for 100 TB media tables.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256_8", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: dimensions derived from the
    content hash. Replace with a real decoder in production."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192  # 64..255
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 4
    return width, height, n_frames


def decode_image_real(payload: bytes):  # pragma: no cover
    """Production decode hook. STUB: no codec libs in this container."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow; not available in this sandbox"
        )
    import io

    return Image.open(io.BytesIO(payload))


def decode_media_meta(df: DataFrame, id_col: str = "media_id",
                      payload_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column via
    mapInPandas (never per-row Python UDF dispatch)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            meta = [
                (None, None, None, None, None)
                if p is None
                else (len(p), hashlib.sha256(p).hexdigest()[:8], *_fake_decode(p))
                for p in payloads
            ]
            out = pd.DataFrame(
                meta, columns=["n_bytes", "sha256_8", "width", "height", "n_frames"]
            )
            out.insert(0, "media_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(fn, MEDIA_META_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2, id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """Frame-sampling plumbing: expand each media row into (media_id,
    frame_no) rows for every_n-th frame of the (fake-)decoded stream.
    The explode happens JVM-side from the decoded frame count."""
    meta = decode_media_meta(df, id_col, payload_col)
    return meta.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_no"),
    )
