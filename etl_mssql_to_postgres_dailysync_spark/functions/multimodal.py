"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container ships no image/audio codecs, so the *decode* kernels are
deterministic fakes (clearly marked) or raise ``NotImplementedError`` —
the Spark-side contract (schemas, batch iteration, partitioning, UDF
signatures) is real and tested, and a real codec drops into ``_decode_bytes``
without touching the plan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields)
    + [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from the documents fixture: the text bytes stand in
    for an encoded blob (deterministic; real pipelines read binary files via
    ``spark.read.format("binaryFile")``)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _decode_bytes(media_type: str, payload: bytes) -> dict:
    """STUB DECODER — deterministic fake. A real implementation would use
    PIL / libsndfile / pyav here; none are in the container."""
    try:  # pragma: no cover - exercised only when codecs exist
        import PIL  # noqa: F401

        raise NotImplementedError("real codec path not wired in this container")
    except ImportError:
        pass
    n = len(payload or b"")
    if media_type == "image":
        return {"width": (n % 64) + 1, "height": (n % 48) + 1, "n_frames": 1, "sample_rate": None}
    if media_type == "audio":
        return {"width": None, "height": None, "n_frames": None, "sample_rate": 8000 + (n % 8) * 1000}
    return {"width": (n % 64) + 1, "height": (n % 48) + 1, "n_frames": (n % 30) + 1, "sample_rate": None}


def decode_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched decode: ``mapInPandas`` keeps per-batch (not per-row)
    Python overhead and preserves partitioning (no shuffle)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                _decode_bytes(mt, pl)
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            out = pdf.copy()
            for field in ("width", "height", "n_frames", "sample_rate"):
                out[field] = pd.array(
                    [m[field] for m in meta], dtype="Int32"
                )
            yield out

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling for 'video' payloads: fixed-stride byte chunks stand in
    for decoded frames. One output row per frame, produced per Arrow batch."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, mt, pl in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                if mt != "video" or pl is None:
                    continue
                for i in range(min(max_frames, max(1, len(pl) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(pl[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_bytes": frames}
            )

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub: real kernel requires a codec. The plan-level
    contract (binary in -> binary out, map-only) is what matters here."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires an image codec (PIL), not present in this container"
        )

    return df.mapInPandas(resize, schema=df.schema)


AUDIO_CHUNK_SCHEMA = (
    "media_id long, chunk_no int, start_byte long, n_bytes long, chunk_hash long"
)


def chunk_audio(
    df: DataFrame, window: int = 256, stride: int = 192, max_chunks: int = 4
) -> DataFrame:
    """Fixed-duration audio chunking over opaque binary payloads: overlapping
    byte windows (window/stride in bytes stand in for sample frames — a real
    deployment multiplies by bytes-per-sample x rate) with a 60-bit md5
    fingerprint per chunk (the dedupe/lineage key, same hash family as
    functions/hashing.md5_long but over raw BYTES). Arrow-batched
    mapInPandas: payload bytes never leave the executor un-batched, output
    is one row per chunk. The chunk fingerprint lets chunk-level dedup reuse
    the exact-dedup machinery unchanged."""
    import hashlib

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, starts, sizes, hashes = [], [], [], [], []
            for mid, mt, pl in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                if mt != "audio" or pl is None:
                    continue
                n = len(pl)
                pos, no = 0, 0
                while pos < n and no < max_chunks:
                    piece = bytes(pl[pos : pos + window])
                    ids.append(mid)
                    nos.append(no)
                    starts.append(pos)
                    sizes.append(len(piece))
                    hashes.append(
                        int(hashlib.md5(piece).hexdigest()[:15], 16)
                    )
                    pos += stride
                    no += 1
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "chunk_no": nos,
                    "start_byte": starts,
                    "n_bytes": sizes,
                    "chunk_hash": hashes,
                }
            )

    return df.mapInPandas(chunk, schema=AUDIO_CHUNK_SCHEMA)


RESIZED_SCHEMA = "media_id long, out_w int, out_h int, n_bytes long, content_hash long"


def resize_raw_images(
    df: DataFrame, *, src_w: int, src_h: int, dst_w: int, dst_h: int, channels: int = 3
) -> DataFrame:
    """REAL image resize over raw interleaved-RGB byte payloads (no codec:
    the payload IS the pixel buffer, the contract every decoded-image
    pipeline stage works with): numpy nearest-neighbor index selection per
    Arrow batch — `buf.reshape(h, w, c)[y_idx][:, x_idx]` — then a 60-bit
    md5 fingerprint of the resized bytes for lineage/dedup. Payloads shorter
    than src_w*src_h*channels are skipped (malformed frame -> quarantine
    path, the errors->NULL discipline applied to binary)."""
    import hashlib

    import numpy as np

    need = src_w * src_h * channels
    y_idx = (np.arange(dst_h) * src_h) // dst_h
    x_idx = (np.arange(dst_w) * src_w) // dst_w

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for mid, pl in zip(pdf["media_id"], pdf["payload"]):
                if pl is None or len(pl) < need:
                    continue
                buf = np.frombuffer(bytes(pl[:need]), dtype=np.uint8).reshape(
                    src_h, src_w, channels
                )
                out = buf[y_idx][:, x_idx].tobytes()
                ids.append(mid)
                outs.append(out)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "out_w": [dst_w] * len(ids),
                    "out_h": [dst_h] * len(ids),
                    "n_bytes": [len(o) for o in outs],
                    "content_hash": [
                        int(hashlib.md5(o).hexdigest()[:15], 16) for o in outs
                    ],
                }
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


def dhash_images(
    df: DataFrame, *, src_w: int = 8, src_h: int = 8, channels: int = 3
) -> DataFrame:
    """Perceptual difference-hash (dHash) over raw interleaved-RGB buffers:
    integer grayscale ``(R+G+B) // channels`` per pixel, then one bit per
    horizontally-adjacent comparison ``gray[r,c] < gray[r,c+1]`` — bit index
    ``r*(w-1)+c`` — packed into a bigint (w=8, h=8 -> 56 bits). The standard
    near-dup fingerprint for images: perceptually-close frames land within a
    few Hamming bits even when bytes differ.

    Pure integer math on the decoded buffer, so the kernel value-checks
    against a character-wise SQL oracle (byte == char on the fixture).
    Map-only, Arrow-batched, no shuffle."""
    import numpy as np

    from pyspark.sql import types as T

    need = src_w * src_h * channels
    weights = (1 << np.arange(src_h * (src_w - 1), dtype=np.int64)).reshape(
        src_h, src_w - 1
    )

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, pl in zip(pdf["media_id"], pdf["payload"]):
                if pl is None or len(pl) < need:
                    continue
                buf = np.frombuffer(bytes(pl[:need]), dtype=np.uint8)
                gray = buf.astype(np.int64).reshape(src_h, src_w, channels).sum(
                    axis=2
                ) // channels
                bits = gray[:, :-1] < gray[:, 1:]
                ids.append(mid)
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ])
    return df.mapInPandas(dhash, schema=schema)
