"""Image columns: binary payload + typed metadata struct, with decode /
resize / feature-extract as ``mapInPandas`` stages.

Data model (SURVEY.md section 1.1, mirroring Spark's image-schema
convention): ``struct(height, width, n_channels, mode, data: binary)``.
The engine treats pixels as opaque bytes until a processing stage needs
them; stages operate on Arrow batches so the Python boundary is crossed
once per batch, not per row.

What is real here vs stubbed (environment has numpy but no PIL/OpenCV):

- RAW uint8 HxWxC buffers: resize (nearest-neighbor), per-channel stats,
  frame sampling — fully implemented in numpy, deterministic, tested.
- PNG decode: native (``multimodal/png.py``, stdlib zlib — no imaging
  library).
- JPEG decode: native (``multimodal/jpeg.py``, baseline sequential DCT in
  pure numpy, verified against the JVM's javax.imageio decoder).
  Progressive/arithmetic streams raise ``NotImplementedError`` naming PIL.
- Other formats (webp, gif, ...): require PIL — the decode stage raises
  ``NotImplementedError`` with the dependency named unless PIL is
  importable.  The Spark-side plumbing (schema, batching, UDF signature)
  is identical either way, which is the part that matters at scale.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RAW_MODE = "raw_u8"  # H*W*C uint8, C-order

IMAGE_STRUCT = (
    "struct<height:int,width:int,n_channels:int,mode:string,data:binary>"
)


def attach_image_meta(
    data: Column, height: int, width: int, n_channels: int = 3,
    mode: str = RAW_MODE,
) -> Column:
    """Wrap raw image bytes in the typed metadata struct (pure column op)."""
    return F.struct(
        F.lit(height).alias("height"),
        F.lit(width).alias("width"),
        F.lit(n_channels).alias("n_channels"),
        F.lit(mode).alias("mode"),
        data.alias("data"),
    )


def decode_compressed(fmt: str = "jpeg"):
    """Decoder for compressed image bytes -> raw array.

    PNG decodes natively (``multimodal/png.py``, stdlib zlib) and JPEG
    decodes natively too (``multimodal/jpeg.py``, baseline + extended
    sequential + progressive DCT in pure numpy — arithmetic-coded and
    lossless streams raise with Pillow named).  Other formats need PIL:
    the stage raises with the dependency named unless it is importable;
    the Spark-side plumbing is identical either way."""
    if fmt.lower() == "png":
        from label_maker_dask_spark.multimodal.png import decode_png

        return decode_png
    if fmt.lower() in ("jpeg", "jpg"):
        from label_maker_dask_spark.multimodal.jpeg import decode_jpeg

        return decode_jpeg
    try:
        from PIL import Image  # type: ignore  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"{fmt} decode requires Pillow, which is not installed; "
            "png, jpeg and raw_u8 buffers are fully supported without it"
        ) from exc

    def decode(blob: bytes) -> np.ndarray:  # pragma: no cover - env-dependent
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(blob)))

    return decode


def _iter_images(pdf: pd.DataFrame, h: int, w: int, c: int,
                 image_col: str = "image"):
    for blob in pdf[image_col]:
        yield np.frombuffer(blob, dtype=np.uint8).reshape(h, w, c)


def resize_images(
    df: DataFrame,
    src_hw: Tuple[int, int],
    dst_hw: Tuple[int, int],
    n_channels: int = 3,
    image_col: str = "image",
    key_cols: Tuple[str, ...] = ("z", "x", "y"),
) -> DataFrame:
    """Nearest-neighbor resize of raw uint8 images — one Arrow batch at a
    time, pure numpy indexing (no Python per-pixel work)."""
    sh, sw = src_hw
    dh, dw = dst_hw
    rows = np.floor((np.arange(dh) + 0.5) * sh / dh).astype(np.int64)
    cols = np.floor((np.arange(dw) + 0.5) * sw / dw).astype(np.int64)
    schema = ", ".join(f"{k} long" for k in key_cols) + ", image binary"

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[list(key_cols)].copy()
            out["image"] = [
                arr[rows][:, cols].tobytes()
                for arr in _iter_images(pdf, sh, sw, n_channels, image_col)
            ]
            yield out

    return df.mapInPandas(scan, schema=schema)


def image_channel_stats(
    df: DataFrame,
    src_hw: Tuple[int, int],
    n_channels: int = 3,
    image_col: str = "image",
    key_cols: Tuple[str, ...] = ("z", "x", "y"),
) -> DataFrame:
    """Per-image, per-channel mean/min/max — the feature-extraction shape
    (decode -> vectorized reduce -> small typed columns)."""
    sh, sw = src_hw
    schema = (
        ", ".join(f"{k} long" for k in key_cols)
        + ", ch_mean array<double>, ch_min array<int>, ch_max array<int>"
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, mins, maxs = [], [], []
            for arr in _iter_images(pdf, sh, sw, n_channels, image_col):
                means.append([round(float(m), 6) for m in arr.mean(axis=(0, 1))])
                mins.append([int(m) for m in arr.min(axis=(0, 1))])
                maxs.append([int(m) for m in arr.max(axis=(0, 1))])
            out = pdf[list(key_cols)].copy()
            out["ch_mean"], out["ch_min"], out["ch_max"] = means, mins, maxs
            yield out

    return df.mapInPandas(scan, schema=schema)


def sample_frames(
    df: DataFrame,
    frame_hw: Tuple[int, int],
    n_channels: int = 3,
    every_k: int = 5,
    video_col: str = "video",
    key_cols: Tuple[str, ...] = ("clip_id",),
) -> DataFrame:
    """Frame sampling over a "video" column modeled as concatenated raw
    frames: emit every k-th frame as its own image row (fan-out UDTF shape).
    Container/codec demux would slot in where the reshape is — that part
    needs a codec library and stays out of scope; the distributed plumbing
    (batch iteration, fan-out, schema) is the real thing."""
    fh, fw = frame_hw
    frame_bytes = fh * fw * n_channels
    schema = (
        ", ".join(f"{k} long" for k in key_cols)
        + ", frame_idx int, image binary"
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            key_arrays = [pdf[k].to_numpy() for k in key_cols]
            for ridx, blob in enumerate(pdf[video_col].to_numpy()):
                n_frames = len(blob) // frame_bytes
                keys = {k: arr[ridx] for k, arr in zip(key_cols, key_arrays)}
                for i in range(0, n_frames, every_k):
                    rows.append(
                        {
                            **keys,
                            "frame_idx": i,
                            "image": blob[i * frame_bytes : (i + 1) * frame_bytes],
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(scan, schema=schema)


def audio_rms_windows(
    df: DataFrame,
    window_samples: int = 1024,
    audio_col: str = "audio",
    key_cols: Tuple[str, ...] = ("clip_id",),
) -> DataFrame:
    """RMS energy per fixed-size window over raw PCM int16 mono audio —
    real numpy signal math (PCM needs no codec); compressed audio decode
    would gate on a codec library exactly like ``decode_compressed``."""
    schema = (
        ", ".join(f"{k} long" for k in key_cols)
        + ", window_idx int, rms double"
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            key_arrays = [pdf[k].to_numpy() for k in key_cols]
            for ridx, blob in enumerate(pdf[audio_col].to_numpy()):
                pcm = np.frombuffer(blob, dtype=np.int16)
                n = len(pcm) // window_samples
                if n == 0:
                    continue
                w = pcm[: n * window_samples].reshape(n, window_samples)
                rms = np.sqrt((w.astype(np.float64) ** 2).mean(axis=1))
                keys = {k: arr[ridx] for k, arr in zip(key_cols, key_arrays)}
                for i, v in enumerate(rms):
                    rows.append(
                        {
                            **keys,
                            "window_idx": i,
                            "rms": round(float(v), 6),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(scan, schema=schema)


def audio_zcr_windows(
    df: DataFrame,
    window_samples: int = 1024,
    audio_col: str = "audio",
    key_cols: Tuple[str, ...] = ("clip_id",),
) -> DataFrame:
    """Zero-crossing rate per fixed-size window over raw PCM int16 mono
    audio — the standard voiced/unvoiced + noisiness feature next to RMS
    energy.  A crossing is a sign change between adjacent samples with
    sign(s) = +1 for s >= 0 else -1 (the >= 0 convention keeps zeros
    deterministic); zcr = crossings / (window - 1).  Integer crossing
    counts divided by an integer make the rounded rate exact across
    engines."""
    schema = (
        ", ".join(f"{k} long" for k in key_cols)
        + ", window_idx int, zcr double"
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            key_arrays = [pdf[k].to_numpy() for k in key_cols]
            for ridx, blob in enumerate(pdf[audio_col].to_numpy()):
                pcm = np.frombuffer(blob, dtype=np.int16)
                n = len(pcm) // window_samples
                if n == 0:
                    continue
                w = pcm[: n * window_samples].reshape(n, window_samples)
                sign = np.where(w >= 0, 1, -1)
                crossings = (sign[:, 1:] != sign[:, :-1]).sum(axis=1)
                keys = {k: arr[ridx] for k, arr in zip(key_cols, key_arrays)}
                for i, c in enumerate(crossings):
                    rows.append(
                        {
                            **keys,
                            "window_idx": i,
                            "zcr": round(
                                int(c) / (window_samples - 1), 6
                            ),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(scan, schema=schema)
