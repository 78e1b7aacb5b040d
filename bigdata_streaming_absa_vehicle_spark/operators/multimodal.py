"""Multimodal column plumbing (SURVEY.md §2K, X-05; reference: JPEG frames as
base64 JSON strings, vehicle_producer.py:23-26 / vehicle_consumer.py:81).

Media payloads are opaque `binary` columns with a typed metadata struct.
Decode / feature-extraction runs as Arrow-batched `mapInPandas` — the real
Spark plumbing (schema, batch iteration, partition preservation) with the
actual pixel decode STUBBED deterministically: the image/audio libraries are
not in this container, so `decode_image_meta` derives "decoded" metadata from
the payload's md5 (documented, reproducible, oracle-checkable) and
`decode_image_pixels` raises NotImplementedError at the clearly-marked point
where cv2.imdecode would run (the reference's UDF does exactly that at
vehicle_consumer.py:81-83).

At scale: payloads never pass through the driver; mapInPandas streams Arrow
batches executor-side, and metadata-only queries (dimensions, content hash)
prune the binary column out of the scan entirely.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema of the decoded-metadata output (plumbing contract for D-01 rewrites)
DECODED_META_SCHEMA = (
    "doc_id long, content_md5 string, n_bytes int, fake_width int, fake_height int"
)


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a string column as a first-class binary payload + metadata struct
    (the engine-native form of the reference's base64-in-JSON frames)."""
    payload = F.col(text_col).cast("binary")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_image_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': md5-derived deterministic stand-ins for
    width/height. Replace the two marked lines with a real cv2/PIL decode when
    the libraries exist; the Spark plumbing (schema, batching, no driver
    round-trip) is what this operator tests."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            md5s = payloads.map(lambda b: hashlib.md5(b).hexdigest())
            # STUB decode: real impl would be cv2.imdecode(np.frombuffer(b), ...)
            widths = md5s.map(lambda h: int(h[:4], 16) % 1920)
            heights = md5s.map(lambda h: int(h[4:8], 16) % 1080)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_md5": md5s,
                    "n_bytes": payloads.map(len).astype("int32"),
                    "fake_width": widths.astype("int32"),
                    "fake_height": heights.astype("int32"),
                }
            )

    return media.mapInPandas(batches, schema=DECODED_META_SCHEMA)


def decode_image_pixels(media: DataFrame) -> DataFrame:
    """The genuinely-unstubable path: actual pixel decode requires cv2/PIL,
    absent from this container."""
    raise NotImplementedError(
        "pixel decode requires cv2/PIL (not in this container); "
        "decode_image_meta() exercises the identical mapInPandas plumbing"
    )


ORACLE_DECODED_META = """
    SELECT doc_id,
           md5(text) AS content_md5,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 1920 AS INTEGER) AS fake_width,
           CAST(CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 1080 AS INTEGER) AS fake_height
    FROM documents
    ORDER BY doc_id
"""
