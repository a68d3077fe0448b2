"""Multimodal columns: image/audio/video as opaque `binary` payloads
with typed metadata, processed by Arrow-batched `mapInPandas` stages.

Design (100 TB):
- media travels as one `binary` column next to its typed metadata
  struct; Spark never interprets the bytes except inside explicit
  decode stages, so column pruning drops the heavy bytes whenever a
  query only touches metadata.
- decode / feature-extract / frame-sample are `mapInPandas` stages:
  one Python worker per partition, Arrow transfer, numpy over the
  batch.  Partitioning is inherited — media rows stay co-located with
  their tile/doc partitions, so no extra shuffle is introduced by a
  decode stage.
- the real codec step (JPEG/PNG/opus decode) needs libs this container
  does not ship; `decode_pixels` is therefore an explicitly-marked
  NotImplementedError stub, while the container format (header parse,
  frame offsets, byte slicing, feature hashing) is real and tested.

Blob format (deterministic stand-in for a WARC media record, pure
function of doc_id so DuckDB can recompute every metadata field):

    offset 0..3   magic b"MMB1"
    offset 4..5   width  u16 BE   = 64 + (sha256(doc_id)[hex 0:4]  % 960)
    offset 6..7   height u16 BE   = 64 + (sha256(doc_id)[hex 4:8]  % 960)
    offset 8      channels u8     = 1  + (sha256(doc_id)[hex 8:10] % 4)
    offset 9      n_frames u8     = 1 for image; 2 + (hex 10:12 % 7) video
    offset 10..   n_frames x 32-byte frames (sha256 digest stream)

kind = 'video' when doc_id % 3 == 0 else 'image'.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_media",
    "decode_media_meta",
    "frame_sample",
    "resize_frames",
    "byte_histogram_features",
    "decode_pixels",
]

MAGIC = b"MMB1"
HEADER_LEN = 10
FRAME_LEN = 32
# the synthetic codec's raster layout: each 32-byte frame is an
# 8-wide x 4-high grayscale grid (row-major)
FRAME_W = 8
FRAME_H = 4


def _blob_fields(doc_id: int) -> tuple[int, int, int, int, str]:
    h = hashlib.sha256(str(doc_id).encode()).hexdigest()
    width = 64 + (int(h[0:4], 16) % 960)
    height = 64 + (int(h[4:8], 16) % 960)
    channels = 1 + (int(h[8:10], 16) % 4)
    kind = "video" if doc_id % 3 == 0 else "image"
    n_frames = (2 + (int(h[10:12], 16) % 7)) if kind == "video" else 1
    return width, height, channels, n_frames, kind


def make_blob(doc_id: int) -> bytes:
    """Build the deterministic media blob for a doc (driver/oracle use)."""
    width, height, channels, n_frames, _ = _blob_fields(doc_id)
    body = b""
    seed = hashlib.sha256(f"media|{doc_id}".encode()).digest()
    frame = seed
    for _ in range(n_frames):
        body += frame
        frame = hashlib.sha256(frame).digest()
    return (
        MAGIC
        + width.to_bytes(2, "big")
        + height.to_bytes(2, "big")
        + bytes([channels, n_frames])
        + body
    )


def attach_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Add (media: binary, media_kind: string) columns — the
    deterministic WARC-payload stand-in, built per Arrow batch."""
    cols = df.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["media"] = [make_blob(int(i)) for i in pdf[id_col]]
            out["media_kind"] = [
                "video" if int(i) % 3 == 0 else "image" for i in pdf[id_col]
            ]
            yield out

    schema = df.schema.simpleString()[7:-1] + ",media binary,media_kind string"
    return df.mapInPandas(gen, schema=schema)


def decode_media_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Parse the blob header into typed metadata (the cheap, always-
    available decode stage).  Vectorized header parse: the fixed-width
    prefix of every blob in the batch is staged into one uint8 matrix."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"]
            n = len(pdf)
            hdr = np.zeros((n, HEADER_LEN), dtype=np.uint8)
            sizes = np.empty(n, dtype=np.int64)
            for i, b in enumerate(blobs):
                hdr[i] = np.frombuffer(b[:HEADER_LEN], dtype=np.uint8)
                sizes[i] = len(b)
            if n and not (hdr[:, :4] == np.frombuffer(MAGIC, np.uint8)).all():
                raise ValueError("bad media magic")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "kind": pdf["media_kind"].to_numpy(),
                    "width": (hdr[:, 4].astype(np.int32) << 8) | hdr[:, 5],
                    "height": (hdr[:, 6].astype(np.int32) << 8) | hdr[:, 7],
                    "channels": hdr[:, 8].astype(np.int32),
                    "n_frames": hdr[:, 9].astype(np.int32),
                    "n_bytes": sizes,
                }
            )

    return df.select(id_col, "media", "media_kind").mapInPandas(
        parse,
        schema=(
            f"{id_col} bigint, kind string, width int, height int, "
            "channels int, n_frames int, n_bytes bigint"
        ),
    )


def frame_sample(
    df: DataFrame, every: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Sample every `every`-th frame of each blob: emits one row per
    sampled frame with its byte offset/length and the frame bytes.
    The UDTF analog — rows out != rows in, still one pass, no shuffle."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, frames = [], [], [], [], []
            for did, blob in zip(pdf[id_col], pdf["media"]):
                n_frames = blob[9]
                for fi in range(0, n_frames, every):
                    off = HEADER_LEN + fi * FRAME_LEN
                    ids.append(did)
                    idxs.append(fi)
                    offs.append(off)
                    lens.append(FRAME_LEN)
                    frames.append(blob[off : off + FRAME_LEN])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_off": pd.Series(offs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return df.select(id_col, "media").mapInPandas(
        sample,
        schema=(
            f"{id_col} bigint, frame_idx int, frame_off bigint, "
            "frame_len bigint, frame binary"
        ),
    )


def resize_frames(
    frames: DataFrame,
    out_w: int = 4,
    out_h: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Area-mean resize of sampled frames (the brief's `resize` stage):
    consumes `frame_sample` output, interprets each frame's bytes
    through the synthetic 8x4 grayscale raster, and pools to
    (out_h, out_w) by exact block averaging — one numpy pass per Arrow
    batch, the same shape a real decoded-image resize takes (only the
    codec is the fixed-layout fake; swap the reshape for a real decode
    and the pooling math is unchanged).  Output pixels are row-major
    array<double> means in [0, 255]."""
    if FRAME_W % out_w or FRAME_H % out_h:
        raise ValueError(
            f"(out_w, out_h) must divide ({FRAME_W}, {FRAME_H})"
        )
    bw, bh = FRAME_W // out_w, FRAME_H // out_h

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            raster = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["frame"]]
            ).reshape(n, FRAME_H, FRAME_W).astype(np.float64)
            pooled = raster.reshape(n, out_h, bh, out_w, bw).mean(axis=(2, 4))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "frame_idx": pdf["frame_idx"].to_numpy(),
                    "out_w": np.full(n, out_w, dtype=np.int32),
                    "out_h": np.full(n, out_h, dtype=np.int32),
                    "pixels": list(pooled.reshape(n, -1)),
                }
            )

    return frames.select(id_col, "frame_idx", "frame").mapInPandas(
        rs,
        schema=(
            f"{id_col} bigint, frame_idx int, out_w int, out_h int, "
            "pixels array<double>"
        ),
    )


def byte_histogram_features(
    df: DataFrame, bins: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Byte-histogram embedding of the media body (a real, lib-free
    feature extractor): `bins` normalized counts over the body bytes.
    Output feeds the similarity operators (array<double>)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.zeros((len(pdf), bins), dtype=np.float64)
            for i, blob in enumerate(pdf["media"]):
                body = np.frombuffer(blob, dtype=np.uint8)[HEADER_LEN:]
                if len(body):
                    hist = np.bincount(body >> (8 - bins.bit_length() + 1),
                                       minlength=bins)[:bins]
                    vecs[i] = hist / len(body)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "features": list(vecs)}
            )

    return df.select(id_col, "media").mapInPandas(
        feats, schema=f"{id_col} bigint, features array<double>"
    )


def decode_pixels(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """STUB — real pixel decode (JPEG/PNG -> HxWxC array) requires
    imaging libraries not present in this container.  The Spark-side
    contract (schema, batching, partition inheritance) is fixed here so
    a real codec drops in by replacing `_decode_one`.

    Raises NotImplementedError at execution time, by design.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _decode_one(blob: bytes) -> np.ndarray:
            raise NotImplementedError(
                "pixel decode requires an imaging library (PIL/cv2); "
                "this container ships none — see module docstring"
            )

        for pdf in batches:
            rows = [_decode_one(b) for b in pdf["media"]]
            yield pd.DataFrame({id_col: pdf[id_col], "pixels": rows})

    return df.select(id_col, "media").mapInPandas(
        decode, schema=f"{id_col} bigint, pixels array<double>"
    )
