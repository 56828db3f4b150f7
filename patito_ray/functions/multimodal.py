"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata columns
alongside (the web-page ``html:binary`` column is the same pattern).
Decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages: codecs load once per actor in ``__init__``,
batches stay SMALL (payload bytes dominate memory, so ``batch_size``
is sized by bytes not rows).

The actual decoders (PIL/ffmpeg/torchaudio) are NOT in this container;
each stage therefore has two modes:
- ``fake=True`` (default): a deterministic stand-in decode derived from
  the payload hash — schema, batch sizing, actor signatures and output
  layout are all real and tested;
- ``fake=False``: raises NotImplementedError at the exact point the
  real codec call belongs (clearly marked below).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from patito_ray.state.sketches import hash64

# Rows per batch for heavy binary payloads: ~64 MiB / ~1 MiB per image.
MEDIA_BATCH_SIZE = 64


class ImageDecode:
    """binary image -> (width, height, n_channels, mean_luma) columns."""

    def __init__(self, fake: bool = True) -> None:
        self.fake = fake
        if not fake:
            # STUB: the real path would `from PIL import Image` here,
            # once per actor. Not available in this container.
            raise NotImplementedError(
                "real image decoding requires PIL/opencv; run with fake=True"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column("image")
        h = hash64(payload)
        width = (h % np.uint64(1920) + np.uint64(16)).astype(np.int32)
        height = ((h >> np.uint64(16)) % np.uint64(1080) + np.uint64(16)).astype(np.int32)
        luma = ((h >> np.uint64(32)) % np.uint64(256)).astype(np.float64) / 255.0
        return (
            batch.append_column("width", pa.array(width, type=pa.int32()))
            .append_column("height", pa.array(height, type=pa.int32()))
            .append_column("n_channels", pa.array(np.full(len(batch), 3, np.int32)))
            .append_column("mean_luma", pa.array(luma, type=pa.float64()))
        )


class ImageResizeFeatures:
    """Deterministic fake 'resize + embed': emits a fixed-dim feature
    vector per image (list<float>). Real path = model inference per
    batch on an actor with the model in __init__."""

    def __init__(self, dim: int = 16, fake: bool = True) -> None:
        self.dim = dim
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "real feature extraction requires a vision model; run with fake=True"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = hash64(batch.column("image"))
        feats = np.empty((len(batch), self.dim), dtype=np.float32)
        x = h.copy()
        for j in range(self.dim):
            x = (x * np.uint64(6364136223846793005) + np.uint64(1442695040888963407)) & np.uint64(
                0xFFFFFFFFFFFFFFFF
            )
            feats[:, j] = (x % np.uint64(10_000)).astype(np.float32) / 10_000.0
        return batch.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.dim
            ).cast(pa.list_(pa.float32())),
        )


class AudioFrameSample:
    """binary audio -> sampled frame offsets + duration metadata."""

    def __init__(self, frames: int = 4, fake: bool = True) -> None:
        self.frames = frames
        self.fake = fake
        if not fake:
            # STUB: real path decodes headers via soundfile/ffprobe here.
            raise NotImplementedError(
                "real audio decoding requires ffmpeg/soundfile; run with fake=True"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = hash64(batch.column("audio"))
        duration = (h % np.uint64(600_000)).astype(np.float64) / 1000.0
        offsets = [
            [float(d) * (i + 1) / (self.frames + 1) for i in range(self.frames)]
            for d in duration
        ]
        return batch.append_column(
            "duration_sec", pa.array(duration, type=pa.float64())
        ).append_column("frame_offsets", pa.array(offsets, type=pa.list_(pa.float64())))


def decode_images(ds: Any, concurrency: int = 4, fake: bool = True) -> Any:
    return ds.map_batches(
        ImageDecode,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


def image_features(ds: Any, dim: int = 16, concurrency: int = 4, fake: bool = True) -> Any:
    return ds.map_batches(
        ImageResizeFeatures,
        fn_constructor_kwargs={"dim": dim, "fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


def sample_audio_frames(ds: Any, frames: int = 4, concurrency: int = 4, fake: bool = True) -> Any:
    return ds.map_batches(
        AudioFrameSample,
        fn_constructor_kwargs={"frames": frames, "fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )
