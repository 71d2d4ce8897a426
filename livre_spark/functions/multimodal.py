"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery is real and tested - schema, Arrow batching,
partitioning, UDF signatures.  The media *decode* itself is stubbed: the
image/audio libraries are not in this container, so ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic byte-histogram "feature vector" stands in.  Swapping the
fake for a real decoder (PIL / torchaudio / pyav) changes one function,
none of the Spark plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", StringType()),     # carried through
])

FEATURE_DIM = 16

MEDIA_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),      # stub metadata
    StructField("height", IntegerType()),
    StructField("features", ArrayType(FloatType())),
    StructField("error", StringType()),
])


def decode_image(buf: bytes, fake: bool = False):
    """Decode an image to (width, height, feature vector).

    STUB: real decoding needs an image library not present in this
    container.  ``fake=True`` produces a deterministic byte-histogram
    feature - the Spark plumbing (batch shapes, schema, partitioning) is
    identical either way.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips - not available in-sandbox")
    hist = np.bincount(np.frombuffer(buf, dtype=np.uint8) >> 4,
                       minlength=FEATURE_DIM).astype(np.float64)
    total = hist.sum() or 1.0
    features = (hist / total).astype(np.float32)
    # fake dimensions derived deterministically from the payload
    width = int(len(buf) % 640) + 1
    height = int((len(buf) // 640) % 480) + 1
    return width, height, [float(x) for x in features]


def media_feature_batches(batches: Iterator[pd.DataFrame],
                          fake: bool = True) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (media_id, kind, content) -> MEDIA_FEATURES_SCHEMA."""
    for batch in batches:
        out = {k.name: [] for k in MEDIA_FEATURES_SCHEMA.fields}
        for mid, kind, content in zip(batch["media_id"], batch["kind"],
                                      batch["content"]):
            buf = bytes(content) if content is not None else b""
            out["media_id"].append(int(mid))
            out["kind"].append(kind)
            out["n_bytes"].append(len(buf))
            try:
                w, h, feats = decode_image(buf, fake=fake)
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(feats)
                out["error"].append(None)
            except NotImplementedError as exc:
                out["width"].append(None)
                out["height"].append(None)
                out["features"].append(None)
                out["error"].append(str(exc))
        yield pd.DataFrame(out)


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Vectorized feature extraction over a binary ``content`` column."""
    def body(batches):
        return media_feature_batches(batches, fake=fake)

    return (media.select("media_id", "kind", "content")
            .mapInPandas(body, schema=MEDIA_FEATURES_SCHEMA))
