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
                # NULL payloads pass through as NULL features —
                # bytes(None) raises and would kill the whole task
                if payload is None:
                    digests.append(None)
                    widths.append(None)
                    heights.append(None)
                    sizes.append(None)
                    continue
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


def extract_features_arrow(blobs: DataFrame) -> DataFrame:
    """mapInArrow feature extraction — the zero-copy sibling of
    :func:`extract_features` and the shape to prefer for binary-heavy
    media at scale: payload bytes stay in Arrow buffers end-to-end
    (mapInPandas boxes every payload into a Python ``bytes`` inside a
    pandas object column — per-row allocation the decoder then copies
    out of again). Vectorizable metadata (``n_bytes``) comes from an
    Arrow compute kernel; only the stubbed decode itself walks items,
    exactly as a real codec consuming ``memoryview``s would. Output
    contract is identical to the pandas path — pinned by a unit test
    and by sharing the ``multimodal_features`` oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _extract(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            payloads = batch.column("payload")
            digests, widths, heights = [], [], []
            for p in payloads:
                raw = p.as_py()
                if raw is None:  # NULL payload -> NULL features
                    digests.append(None)
                    widths.append(None)
                    heights.append(None)
                    continue
                # real decoders take the buffer without a bytes copy;
                # md5 here stands in for the codec
                digest, width, height = _fake_dims(raw)
                digests.append(digest)
                widths.append(width)
                heights.append(height)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("fmt"),
                    pc.cast(pc.binary_length(payloads), pa.int64()),
                    pa.array(widths, pa.int64()),
                    pa.array(heights, pa.int64()),
                    pa.array(digests, pa.string()),
                ],
                names=[
                    "doc_id", "fmt", "n_bytes",
                    "fake_width", "fake_height", "payload_md5",
                ],
            )

    return blobs.mapInArrow(_extract, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, fmt string, width long, height long, "
    "resized_width long, resized_height long, payload binary"
)


def resize_media(blobs: DataFrame, max_side: int = 64) -> DataFrame:
    """mapInPandas resize: scale the (fake-decoded) dimensions so the
    longest side is ``max_side``, preserving aspect ratio with
    integer-floor math. The payload passthrough keeps the Spark-side
    shape production-real (a real impl would re-encode via PIL here —
    see :func:`decode_media` for the stub policy)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            widths, heights, rws, rhs, payloads = [], [], [], [], []
            for payload in batch["payload"]:
                if payload is None:  # NULL payload -> NULL row fields
                    widths.append(None)
                    heights.append(None)
                    rws.append(None)
                    rhs.append(None)
                    payloads.append(None)
                    continue
                raw = bytes(payload)
                _, w, h = _fake_dims(raw)
                scale_num, scale_den = max_side, max(w, h)
                widths.append(w)
                heights.append(h)
                rws.append(w * scale_num // scale_den)
                rhs.append(h * scale_num // scale_den)
                payloads.append(raw)  # re-encode goes here in production
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "fmt": batch["fmt"],
                    "width": widths,
                    "height": heights,
                    "resized_width": rws,
                    "resized_height": rhs,
                    "payload": payloads,
                }
            )

    return blobs.mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_offset long, frame_md5 string"


def sample_frames(blobs: DataFrame, num_frames: int = 4) -> DataFrame:
    """mapInPandas frame sampling: one output row per sampled frame
    (the video→rows fan-out shape). Frames are evenly-spaced byte
    offsets into the payload with an md5 over a window at each offset —
    a deterministic stand-in for keyframe extraction (pyav/ffmpeg in
    production). Emitting multiple rows per input through mapInPandas
    is exactly how a real frame sampler scales: the fan-out happens
    executor-side, batch by batch, never on the driver."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, offsets, hashes = [], [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                if payload is None:  # no payload -> no frames
                    continue
                raw = bytes(payload)
                n = max(len(raw), 1)
                for i in range(num_frames):
                    off = (i * n) // num_frames
                    window = raw[off : off + 16]
                    ids.append(doc_id)
                    idxs.append(i)
                    offsets.append(off)
                    hashes.append(hashlib.md5(window).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_offset": offsets,
                    "frame_md5": hashes,
                }
            )

    return blobs.mapInPandas(_sample, schema=FRAME_SCHEMA)
