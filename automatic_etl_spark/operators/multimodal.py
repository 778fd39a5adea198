"""Multimodal (image/audio/video) column plumbing (SURVEY.md §7).

Media travels as opaque ``binary`` payload columns with typed metadata;
decode / feature-extraction runs as Arrow-batched Python over
``mapInPandas`` — the right shape for wrapping PIL/ffmpeg-style
libraries at scale (per-partition batches, no per-row overhead, schema
declared up front).

The decode libraries are NOT in this container, so :func:`decode_media`
raises ``NotImplementedError`` by design; :func:`extract_features`
uses a DETERMINISTIC FAKE decode (md5-derived dimensions) so the whole
pipeline — schema, batching, partitioning, UDF signature — is real and
oracle-testable even though the codec is stubbed.

Scale notes: mapInPandas streams Arrow batches; payload bytes never
hit the driver. Feature extraction is stateless → embarrassingly
parallel; partition sizing should target ~128 MB of payload per task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, fmt string, n_bytes long, fake_width long, fake_height long, "
    "payload_md5 string"
)


def make_blob_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stand-in media table: (doc_id, fmt, payload binary). Real
    pipelines land bytes from object storage; the fixture encodes the
    document text."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("txt").alias("fmt"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_media(payload: bytes, fmt: str) -> object:
    """REAL decode entry point — stubbed: image/audio libs are not in
    this container. Wire PIL/torchaudio/pyav here in production."""
    raise NotImplementedError(
        f"no codec for {fmt!r} in this environment; extract_features uses "
        "the deterministic fake decode instead"
    )


def _fake_dims(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake decode: md5-derived dimensions. Mirrors what
    a real decoder would emit (width/height) so downstream schema and
    partitioning are production-shaped."""
    digest = hashlib.md5(payload).hexdigest()
    width = 64 + int(digest[0], 16) * 8
    height = 64 + int(digest[1], 16) * 8
    return digest, width, height


def extract_features(blobs: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            digests, widths, heights, sizes = [], [], [], []
            for payload in batch["payload"]:
                raw = bytes(payload)
                digest, width, height = _fake_dims(raw)
                digests.append(digest)
                widths.append(width)
                heights.append(height)
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "fmt": batch["fmt"],
                    "n_bytes": sizes,
                    "fake_width": widths,
                    "fake_height": heights,
                    "payload_md5": digests,
                }
            )

    return blobs.mapInPandas(_extract, schema=FEATURE_SCHEMA)
