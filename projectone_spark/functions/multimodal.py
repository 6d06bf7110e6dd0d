"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side shape is the production design for a 100 TB training-data
pipeline: media travels as a ``binary`` column next to a typed metadata
struct; every decode / feature-extract / resize / frame-sample step is an
Arrow-batched ``mapInPandas`` operator, so work distributes per-partition
with zero driver involvement and vectorized (numpy) inner loops.

Codecs: the real decoders (PIL/opencv/librosa) are NOT installed in this
environment, so the payloads use a deterministic FAKE codec family whose
*parsing and math are real*:

- image  ``FIMG`` | u32 width | u32 height | u8 channels | raster bytes
- video  ``FVID`` | u32 n_frames | u32 frame_bytes | frames
- audio  ``FAUD`` | u32 sample_rate | u32 n_samples | i16 PCM samples

``decode_with_real_library`` marks the swap point: with PIL installed it
would replace ``_parse_image`` 1:1 (same output schema); today it raises
``NotImplementedError`` so the gap is explicit, not silent.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

IMAGE_MAGIC, VIDEO_MAGIC, AUDIO_MAGIC = b"FIMG", b"FVID", b"FAUD"

#: metadata struct DDL stored alongside every media column
IMAGE_META_DDL = "mime string, width int, height int, channels int, n_bytes long"


# -- fake codec (deterministic; real binary packing/parsing) ----------------

def encode_fake_image(width: int, height: int, channels: int = 3,
                      fill: int = 0, texture: int = 0) -> bytes:
    """``texture=0`` keeps the legacy constant raster; nonzero adds a
    deterministic spatial pattern so content-sensitive operators
    (perceptual hashing) have structure to see."""
    n = width * height * channels
    if texture:
        idx = np.arange(n, dtype=np.int64)
        raster = ((fill + texture * ((idx * idx) % 97)) % 256).astype(np.uint8)
    else:
        raster = np.full(n, fill % 256, dtype=np.uint8)
    return (IMAGE_MAGIC + struct.pack("<IIB", width, height, channels)
            + raster.tobytes())


def encode_fake_video(n_frames: int, frame_bytes: int = 16,
                      fill: int = 0) -> bytes:
    body = np.full(n_frames * frame_bytes, fill % 256, dtype=np.uint8)
    return VIDEO_MAGIC + struct.pack("<II", n_frames, frame_bytes) + body.tobytes()


def encode_fake_audio(sample_rate: int, n_samples: int,
                      amplitude: int = 0) -> bytes:
    pcm = np.full(n_samples, amplitude, dtype=np.int16)
    return AUDIO_MAGIC + struct.pack("<II", sample_rate, n_samples) + pcm.tobytes()


def _parse_image(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    assert buf[:4] == IMAGE_MAGIC, "not a FIMG payload"
    w, h, c = struct.unpack("<IIB", buf[4:13])
    raster = np.frombuffer(buf, dtype=np.uint8, offset=13)
    return w, h, c, raster.reshape(h, w, c)


def decode_with_real_library(buf: bytes):  # pragma: no cover - swap point
    """Swap point for a real decoder: replace the body with
    ``PIL.Image.open(io.BytesIO(buf))`` (same return contract as
    ``_parse_image``). Explicitly unimplemented in this environment."""
    raise NotImplementedError(
        "real image decoding needs PIL/opencv, not installed here; "
        "the FAKE codec path exercises the identical Spark plumbing")


# -- Spark operators (mapInPandas; Arrow-batched) ---------------------------

def synthesize_images(df: DataFrame, *, width_expr: str, height_expr: str,
                      fill_expr: str, texture_expr: str = "0",
                      out_col: str = "media") -> DataFrame:
    """Attach a deterministic fake image payload per row. Runs as
    mapInPandas so the binary never exists driver-side."""
    in_cols = df.columns
    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes) + f", {out_col} binary"
    wd, ht, fl, tx = width_expr, height_expr, fill_expr, texture_expr

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = [
                encode_fake_image(int(w), int(h), 3, int(f), int(t))
                for w, h, f, t in zip(pdf["__w"], pdf["__h"],
                                      pdf["__f"], pdf["__t"])
            ]
            yield pdf.drop(columns=["__w", "__h", "__f", "__t"])

    staged = (df.withColumn("__w", F.expr(wd))
              .withColumn("__h", F.expr(ht))
              .withColumn("__f", F.expr(fl))
              .withColumn("__t", F.expr(tx)))
    return staged.mapInPandas(gen, schema).select(*in_cols, out_col)


def decode_image_metadata(df: DataFrame, media_col: str = "media",
                          keep: list[str] | None = None) -> DataFrame:
    """Parse the binary header into typed metadata columns (the decode
    step of the pipeline). Vectorized per Arrow batch."""
    keep = keep or [c for c in df.columns if c != media_col]
    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes if c in keep) \
        + ", width int, height int, channels int, n_bytes bigint"

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [struct.unpack("<IIB", b[4:13]) for b in pdf[media_col]]
            out = pdf[keep].copy()
            out["width"] = [m[0] for m in meta]
            out["height"] = [m[1] for m in meta]
            out["channels"] = [m[2] for m in meta]
            out["n_bytes"] = [len(b) for b in pdf[media_col]]
            yield out

    return df.mapInPandas(dec, schema)


def image_pixel_stats(df: DataFrame, media_col: str = "media",
                      keep: list[str] | None = None) -> DataFrame:
    """Per-image raster statistics (feature-extraction step)."""
    keep = keep or [c for c in df.columns if c != media_col]
    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes if c in keep) \
        + ", mean_pixel double, max_pixel int"

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, maxes = [], []
            for b in pdf[media_col]:
                _, _, _, raster = _parse_image(b)
                means.append(float(raster.mean()))
                maxes.append(int(raster.max()))
            out = pdf[keep].copy()
            out["mean_pixel"] = means
            out["max_pixel"] = maxes
            yield out

    return df.mapInPandas(stats, schema)


def resize_images(df: DataFrame, new_width: int, new_height: int,
                  media_col: str = "media") -> DataFrame:
    """Nearest-neighbor resize of every raster (real numpy indexing math;
    a PIL-backed version would swap only the inner two lines)."""
    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes)

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for b in pdf[media_col]:
                w, h, c, raster = _parse_image(b)
                ys = (np.arange(new_height) * h // new_height)
                xs = (np.arange(new_width) * w // new_width)
                out = raster[ys][:, xs]
                resized.append(IMAGE_MAGIC
                               + struct.pack("<IIB", new_width, new_height, c)
                               + out.tobytes())
            pdf = pdf.copy()
            pdf[media_col] = resized
            yield pdf

    return df.mapInPandas(rs, schema)


def sample_video_frames(df: DataFrame, every_n: int,
                        media_col: str = "media",
                        keep: list[str] | None = None) -> DataFrame:
    """Frame sampling: one output row per kept frame (explode-shaped)."""
    keep = keep or [c for c in df.columns if c != media_col]
    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes if c in keep) \
        + ", frame_idx int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                buf = row[media_col]
                assert buf[:4] == VIDEO_MAGIC, "not a FVID payload"
                n_frames, frame_bytes = struct.unpack("<II", buf[4:12])
                for idx in range(0, n_frames, every_n):
                    start = 12 + idx * frame_bytes
                    rows.append({**{c: row[c] for c in keep},
                                 "frame_idx": idx,
                                 "frame": buf[start:start + frame_bytes]})
            yield pd.DataFrame(rows, columns=[*keep, "frame_idx", "frame"])

    return df.mapInPandas(sample, schema)


def audio_features(df: DataFrame, media_col: str = "media",
                   keep: list[str] | None = None) -> DataFrame:
    """PCM feature extraction: duration + RMS amplitude per clip."""
    keep = keep or [c for c in df.columns if c != media_col]
    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes if c in keep) \
        + ", sample_rate int, duration_ms double, rms double"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srs, durs, rms = [], [], []
            for b in pdf[media_col]:
                assert b[:4] == AUDIO_MAGIC, "not a FAUD payload"
                sr, n = struct.unpack("<II", b[4:12])
                pcm = np.frombuffer(b, dtype=np.int16, offset=12)
                srs.append(sr)
                durs.append(1000.0 * n / sr)
                rms.append(float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))))
            out = pdf[keep].copy()
            out["sample_rate"] = srs
            out["duration_ms"] = durs
            out["rms"] = rms
            yield out

    return df.mapInPandas(feats, schema)


def image_dhash(df: DataFrame, media_col: str = "media",
                keep: list[str] | None = None, grid: int = 8) -> DataFrame:
    """Perceptual difference-hash per image: grayscale, nearest-neighbor
    downsample to (grid+1)×grid, adjacent-column brightness comparisons →
    a grid²-bit hex string. Near-identical images land on the same (or
    Hamming-close) hash, so exact dedup on the hash column IS perceptual
    near-dup grouping — the image-side analogue of d01's content-md5.
    Vectorized numpy per Arrow batch; with a real decoder swapped in
    (``decode_with_real_library``) the operator is unchanged."""
    keep = keep or [c for c in df.columns if c != media_col]
    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes if c in keep) \
        + ", dhash string"

    def hsh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            hashes = []
            for b in pdf[media_col]:
                w, h, c, raster = _parse_image(b)
                gray = raster.astype(np.float64).mean(axis=2)
                ys = np.linspace(0, h - 1, grid).astype(int)
                xs = np.linspace(0, w - 1, grid + 1).astype(int)
                small = gray[np.ix_(ys, xs)]
                bits = (small[:, 1:] > small[:, :-1]).astype(np.uint8).ravel()
                val = 0
                for bit in bits:
                    val = (val << 1) | int(bit)
                hashes.append(format(val, f"0{grid * grid // 4}x"))
            out["dhash"] = hashes
            yield out

    return df.mapInPandas(hsh, schema)
