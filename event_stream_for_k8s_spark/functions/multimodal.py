"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine's multimodal model (SURVEY.md §2 B.11): a row carries
``struct(payload: binary, mime: string, meta: map<string,string>)``.
Spark-side plumbing (schema, partitioning, Arrow batch shape) is real
and tested; the actual media decode is STUBBED because image/audio
libraries are not available in this environment — ``decode_media``
raises ``NotImplementedError`` unless ``fake=True``, which produces a
deterministic fake feature vector so the distributed pipeline around
the decode is exercisable end-to-end.

At scale: payloads live in parquet binary columns (or object-store
paths for >1 MB blobs); ``mapInPandas`` processes them in Arrow
batches so one task holds only a batch of blobs, not a partition of
decoded frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = "doc_id bigint, mime string, byte_len int, feature array<double>"


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text column as a multimodal binary payload + metadata."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary payloads into fixed-size feature vectors.

    Real decode (PIL/librosa/ffmpeg) is unavailable here — STUB. With
    ``fake=True`` a deterministic 4-dim byte-statistic vector stands in
    so the mapInPandas plumbing (schema, batching, partition shape) is
    tested for real.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stand-in"
                )
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                n = max(len(b), 1)
                feats.append(
                    [
                        float(len(b)),
                        float(sum(b) % 997),
                        float(b[0] if b else 0),
                        float(b[-1] if b else 0),
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "byte_len": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.mapInPandas(batches, DECODE_SCHEMA)


FRAMES_SCHEMA = (
    "doc_id bigint, frame_id bigint, offset int, frame_len int, "
    "checksum bigint"
)


def sample_frames(df: DataFrame, stride: int = 128) -> DataFrame:
    """Fixed-stride frame sampling over binary payloads (the video/
    audio "every Nth frame" access pattern, byte-granular here).

    Real frame extraction needs a media demuxer — the SLICING is the
    stub; everything around it (Arrow batching, explode-shaped output,
    per-frame offsets/checksums) is the real distributed plumbing a
    decoder would plug into: replace the byte window with a demuxed
    frame and the schema/partitioning story is unchanged. One input
    row yields ceil(len/stride) output rows; no shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_id": [],
                "offset": [],
                "frame_len": [],
                "checksum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for fid, off in enumerate(range(0, len(b), stride)):
                    frame = b[off : off + stride]
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(fid)
                    out["offset"].append(off)
                    out["frame_len"].append(len(frame))
                    out["checksum"].append(sum(frame) % 997)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAMES_SCHEMA)
