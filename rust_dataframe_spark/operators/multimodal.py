"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column next to a typed metadata struct (mime, dims, duration...),
partition by a content-addressable key, and run decode / feature-extraction /
resize / frame-sampling as Arrow-batched Pandas UDFs over ``mapInPandas`` —
the bytes never round-trip through Python row objects, only Arrow buffers.

The decode step itself needs image/audio libraries that are NOT in this
container, so it is stubbed: ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a clearly-marked deterministic fake
derives "features" from the bytes (length, digest, first bytes).  Everything
around the stub — schema, batch iteration, UDF signature, partitioning — is
real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["attach_payload", "FEATURE_SCHEMA", "extract_features", "decode_image"]

# Output schema of the feature-extraction stage — fixed and explicit, because
# mapInPandas cannot infer it.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal table: binary payload + metadata struct.

    In production the payload column comes straight from the source (parquet
    BYTE_ARRAY / a blob store manifest); here we derive it from text so the
    pipeline is runnable on the synthetic tables.
    """
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("size"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, *, fake: bool = False) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    STUB: real decoding needs PIL/opencv which are not in this container.
    With ``fake=True`` returns a deterministic fake derived from the bytes —
    good enough to exercise the distributed plumbing end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv; not available in this environment"
        )
    n = len(payload)
    return (n % 1920) + 1, (n % 1080) + 1


def extract_features(mm_df: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas``: each batch arrives as a pandas DataFrame; bytes stay in
    Arrow buffers between JVM and Python.  Output schema is FEATURE_SCHEMA.
    """

    def _extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            dims = [decode_image(p, fake=fake_decode) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "digest": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return mm_df.mapInPandas(_extract, FEATURE_SCHEMA)
