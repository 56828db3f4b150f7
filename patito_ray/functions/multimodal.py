"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata columns
alongside (the web-page ``html:binary`` column is the same pattern).
Decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages: codecs load once per actor in ``__init__``,
batches stay SMALL (payload bytes dominate memory, so ``batch_size``
is sized by bytes not rows).

Two modes per stage:

- ``fake=True`` (default): a deterministic stand-in decode derived from
  the payload hash — schema, batch sizing, actor signatures and output
  layout are all real and tested; useful when payloads are synthetic
  placeholders.
- ``fake=False``: REAL decode via the pure-stdlib codecs in
  :mod:`patito_ray.functions.codecs` — PNG (zlib + unfilter), BMP
  (BI_RGB) and PCM WAV all decode natively in this container. Formats
  that genuinely need an external codec library (JPEG, MP3/AAC, video)
  raise ``NotImplementedError`` at the exact call site with the library
  named; a PIL/ffmpeg branch would slot into ``_decode_one`` /
  ``_decode_audio`` unchanged.

The per-row loop inside each ``__call__`` is the irreducible per-image
decode cost (a C codec pays it too); everything around it — batch
sizing, the actor pool, the Arrow output layout — is the part that has
to be right at 100 TB, and is.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from patito_ray.state.sketches import hash64

# Rows per batch for heavy binary payloads: ~64 MiB / ~1 MiB per image.
MEDIA_BATCH_SIZE = 64


class ImageDecode:
    """binary image -> (width, height, n_channels, mean_luma) columns.

    Real mode decodes PNG/BMP payloads with the stdlib codecs; null
    payloads yield null metadata."""

    def __init__(self, fake: bool = True, image_col: str = "image") -> None:
        self.fake = fake
        self.image_col = image_col
        if not fake:
            # real codec path: bind once per actor
            from patito_ray.functions import codecs

            self._decode = codecs.decode_image
            self._to_gray = codecs.to_gray

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column(self.image_col)
        if self.fake:
            h = hash64(payload)
            width = (h % np.uint64(1920) + np.uint64(16)).astype(np.int32)
            height = ((h >> np.uint64(16)) % np.uint64(1080) + np.uint64(16)).astype(
                np.int32
            )
            n_ch = np.full(len(batch), 3, np.int32)
            luma = ((h >> np.uint64(32)) % np.uint64(256)).astype(np.float64) / 255.0
            w_arr = pa.array(width, type=pa.int32())
            h_arr = pa.array(height, type=pa.int32())
            c_arr = pa.array(n_ch, type=pa.int32())
            l_arr = pa.array(luma, type=pa.float64())
        else:
            ws: list[int | None] = []
            hs: list[int | None] = []
            cs: list[int | None] = []
            ls: list[float | None] = []
            for b in payload.to_pylist():
                if b is None:
                    ws.append(None), hs.append(None), cs.append(None), ls.append(None)
                    continue
                img = self._decode(b)
                ih, iw, ic = img.shape
                ws.append(iw), hs.append(ih), cs.append(ic)
                ls.append(float(self._to_gray(img).mean()))
            w_arr = pa.array(ws, type=pa.int32())
            h_arr = pa.array(hs, type=pa.int32())
            c_arr = pa.array(cs, type=pa.int32())
            l_arr = pa.array(ls, type=pa.float64())
        return (
            batch.append_column("width", w_arr)
            .append_column("height", h_arr)
            .append_column("n_channels", c_arr)
            .append_column("mean_luma", l_arr)
        )


class ImageResizeFeatures:
    """binary image -> ``dim``-dim feature vector (list<float>).

    Real mode: decode -> grayscale -> bilinear-resize to a ``dim``-cell
    grid (``sqrt(dim)`` square when ``dim`` is a perfect square, else a
    1 x ``dim`` strip) -> flatten. A deterministic, locality-preserving
    embedding with no model dependency; a vision model loaded once per
    actor would replace ``_featurize`` unchanged."""

    def __init__(
        self, dim: int = 16, fake: bool = True, image_col: str = "image"
    ) -> None:
        self.dim = dim
        self.fake = fake
        self.image_col = image_col
        if not fake:
            from patito_ray.functions import codecs

            self._codecs = codecs
            s = int(round(dim**0.5))
            self._grid = (s, s) if s * s == dim else (1, dim)

    def _featurize(self, payload: bytes) -> np.ndarray:
        cx = self._codecs
        gray = cx.to_gray(cx.decode_image(payload))
        return cx.resize_bilinear(gray, *self._grid).reshape(-1).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if self.fake:
            h = hash64(batch.column(self.image_col))
            feats = np.empty((n, self.dim), dtype=np.float32)
            x = h.copy()
            for j in range(self.dim):
                x = (
                    x * np.uint64(6364136223846793005)
                    + np.uint64(1442695040888963407)
                ) & np.uint64(0xFFFFFFFFFFFFFFFF)
                feats[:, j] = (x % np.uint64(10_000)).astype(np.float32) / 10_000.0
            flat = pa.array(feats.reshape(-1))
            col = pa.FixedSizeListArray.from_arrays(flat, self.dim).cast(
                pa.list_(pa.float32())
            )
        else:
            col = pa.array(
                [
                    None if b is None else self._featurize(b)
                    for b in batch.column(self.image_col).to_pylist()
                ],
                type=pa.list_(pa.float32()),
            )
        return batch.append_column("features", col)


class AudioFrameSample:
    """binary audio -> sampled frame offsets + duration metadata.

    Real mode parses PCM WAV (stdlib ``wave``): true ``duration_sec``
    and ``sample_rate``, evenly spaced ``frame_offsets``, and per-frame
    RMS energy ``frame_rms`` (vectorized over the sample array)."""

    def __init__(
        self, frames: int = 4, fake: bool = True, audio_col: str = "audio"
    ) -> None:
        self.frames = frames
        self.fake = fake
        self.audio_col = audio_col
        if not fake:
            from patito_ray.functions import codecs

            self._decode = codecs.decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.fake:
            h = hash64(batch.column(self.audio_col))
            duration = (h % np.uint64(600_000)).astype(np.float64) / 1000.0
            offsets = [
                [float(d) * (i + 1) / (self.frames + 1) for i in range(self.frames)]
                for d in duration
            ]
            return batch.append_column(
                "duration_sec", pa.array(duration, type=pa.float64())
            ).append_column(
                "frame_offsets", pa.array(offsets, type=pa.list_(pa.float64()))
            )
        durs: list[float | None] = []
        rates: list[int | None] = []
        offs: list[list[float] | None] = []
        rms: list[list[float] | None] = []
        for b in batch.column(self.audio_col).to_pylist():
            if b is None:
                durs.append(None), rates.append(None)
                offs.append(None), rms.append(None)
                continue
            samples, rate = self._decode(b)
            n = len(samples)
            d = n / rate if rate else 0.0
            durs.append(d)
            rates.append(rate)
            centers = [(i + 1) / (self.frames + 1) for i in range(self.frames)]
            offs.append([d * c for c in centers])
            mono = samples.astype(np.float64).mean(axis=1) / 32768.0
            win = max(1, n // (self.frames + 1))
            frame_rms = []
            for c in centers:
                mid = int(c * n)
                lo = max(0, mid - win // 2)
                seg = mono[lo : lo + win]
                frame_rms.append(float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0)
            rms.append(frame_rms)
        return (
            batch.append_column("duration_sec", pa.array(durs, type=pa.float64()))
            .append_column("sample_rate", pa.array(rates, type=pa.int32()))
            .append_column(
                "frame_offsets", pa.array(offs, type=pa.list_(pa.float64()))
            )
            .append_column("frame_rms", pa.array(rms, type=pa.list_(pa.float64())))
        )


#: media decode actors ask for HALF a CPU each: a pipeline chaining two
#: pools (images -> audio) at concurrency c would otherwise reserve 2c
#: whole CPUs and, on a small cluster (tests run Ray at 4 CPUs), starve
#: the upstream read/synth TASKS entirely — every actor waits for input
#: that can never be produced (observed as a clean deadlock, 0% CPU).
#: 2x oversubscription of decode actors is harmless: they alternate
#: with the producing stages under streaming backpressure anyway.
_MEDIA_ACTOR_CPUS = 0.5


def decode_images(ds: Any, concurrency: int = 4, fake: bool = True) -> Any:
    return ds.map_batches(
        ImageDecode,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=_MEDIA_ACTOR_CPUS,
    )


def image_features(ds: Any, dim: int = 16, concurrency: int = 4, fake: bool = True) -> Any:
    return ds.map_batches(
        ImageResizeFeatures,
        fn_constructor_kwargs={"dim": dim, "fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=_MEDIA_ACTOR_CPUS,
    )


def sample_audio_frames(ds: Any, frames: int = 4, concurrency: int = 4, fake: bool = True) -> Any:
    return ds.map_batches(
        AudioFrameSample,
        fn_constructor_kwargs={"fake": fake, "frames": frames},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=_MEDIA_ACTOR_CPUS,
    )


def synth_media_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    media: str = "both",
    containers: "tuple[str, ...]" = ("png", "bmp", "jpeg"),
) -> pa.Table:
    """Deterministic media payloads from an id column: a small RGB PNG
    (gradient + id-seeded phase) and a short PCM WAV (id-keyed sine).
    Real encoders (:mod:`codecs`), real containers — used by the
    ``media_decode`` query so the driver exercises the true decode path
    without external data, and by tests. ``media`` selects which
    payload columns to build ('image' / 'audio' / 'both') so a
    single-modality pipeline doesn't pay for the other encoder."""
    if media not in ("image", "audio", "both"):
        raise ValueError(f"media must be image/audio/both, got {media!r}")
    from patito_ray.functions import codecs as cx

    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    out = batch
    if media in ("image", "both"):
        yy, xx = np.mgrid[0:12, 0:16].astype(np.float64)
        images = []
        for i in ids:
            phase = (i * 37) % 97 / 97.0
            img = np.empty((12, 16, 3), np.uint8)
            img[:, :, 0] = ((xx / 16 + phase) * 255) % 256
            img[:, :, 1] = ((yy / 12 + phase / 2) * 255) % 256
            img[:, :, 2] = (i % 256)
            # container mix like a real crawl (``containers`` lets the
            # A/B attribution harness isolate the JPEG-arm decode cost)
            m = containers[i % len(containers)]
            if m == "png":
                images.append(cx.encode_png(img))
            elif m == "bmp":
                images.append(cx.encode_bmp(img))
            else:
                images.append(cx.encode_jpeg(img, quality=90))
        out = out.append_column("image", pa.array(images, type=pa.binary()))
    if media in ("audio", "both"):
        audios = []
        t = np.arange(800, dtype=np.float64)
        for i in ids:
            freq = 100.0 + (i % 40) * 10.0
            wave_samples = (
                np.sin(2 * np.pi * freq * t / 8000.0) * 18000.0
            ).astype(np.int16)
            audios.append(cx.encode_wav(wave_samples, 8000))
        out = out.append_column("audio", pa.array(audios, type=pa.binary()))
    return out


class ImagePHash:
    """binary image -> 64-bit perceptual aHash (int64 column ``phash``).

    Real decode path only (PNG/BMP/JPEG via the pure-stdlib codecs): decode,
    grayscale, bilinear-resize to 8x8, threshold each cell at the image
    mean, pack the 64 bits. Near-identical images (re-encodes, small
    brightness shifts, single-pixel edits) land within a few bits;
    unrelated images differ in ~32. Null payloads yield null hashes.
    Actor-pool stage: codec functions bind once per actor; decoding is
    inherently per-payload (each PNG is one compressed stream), so the
    loop is the stage's documented unit of work — size batches by
    payload bytes like the other media stages (MEDIA_BATCH_SIZE).
    """

    def __init__(self, image_col: str = "image") -> None:
        self.image_col = image_col
        from patito_ray.functions import codecs

        self._decode = codecs.decode_image
        self._weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        # per-(h, w) bilinear gather plan, built once per shape per actor
        self._grids: dict[tuple[int, int], tuple] = {}

    def _grid(self, h: int, w: int) -> tuple:
        """Flat corner indices + float32 weights of the 8x8 bilinear
        grid over an (h, w) image — the batched equivalent of
        codecs.resize_bilinear with the SAME elementwise IEEE order
        (top/bot lerp then vertical lerp), so hashes are bit-identical
        to the per-image path."""
        g = self._grids.get((h, w))
        if g is not None:
            return g
        ys = (np.arange(8) + 0.5) * h / 8 - 0.5
        xs = (np.arange(8) + 0.5) * w / 8 - 0.5
        y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wy = np.repeat(np.clip(ys - y0, 0.0, 1.0).astype(np.float32), 8)
        wx = np.tile(np.clip(xs - x0, 0.0, 1.0).astype(np.float32), 8)
        iy0, iy1 = np.repeat(y0, 8), np.repeat(y1, 8)
        ix0, ix1 = np.tile(x0, 8), np.tile(x1, 8)
        g = (iy0 * w + ix0, iy0 * w + ix1, iy1 * w + ix0, iy1 * w + ix1, wx, wy)
        self._grids[(h, w)] = g
        return g

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column(self.image_col)
        n = len(payload)
        out = np.zeros(n, np.int64)
        null_mask = np.zeros(n, bool)
        decoded: list = [None] * n
        by_shape: dict[tuple, list[int]] = {}
        # decode is inherently per-payload (each PNG is one compressed
        # stream); everything after it batches per shape class
        for i, b in enumerate(payload.to_pylist()):
            if b is None:
                null_mask[i] = True
                continue
            a = self._decode(b)
            decoded[i] = a
            by_shape.setdefault(a.shape, []).append(i)
        for shape, idxs in by_shape.items():
            st = np.stack([decoded[i] for i in idxs])
            f = st.astype(np.float32) / 255.0
            c = shape[2]
            if c <= 2:  # gray / gray+alpha
                gray = f[..., 0]
            else:
                gray = (
                    0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
                )
            h, w = shape[0], shape[1]
            i00, i01, i10, i11, wx, wy = self._grid(h, w)
            flat = gray.reshape(len(idxs), h * w)
            top = flat[:, i00] * (1 - wx) + flat[:, i01] * wx
            bot = flat[:, i10] * (1 - wx) + flat[:, i11] * wx
            res = top * (1 - wy) + bot * wy
            bits = (res > res.mean(axis=1, keepdims=True)).astype(np.uint64)
            out[idxs] = (bits * self._weights[None, :]).sum(axis=1).view(np.int64)
        return batch.append_column(
            "phash", pa.array(out, type=pa.int64(), mask=null_mask)
        )


def image_near_dups(
    ds: Any,
    id_col: str = "doc_id",
    image_col: str = "image",
    max_hamming: int = 3,
    bands: int = 4,
    concurrency: int = 4,
    num_partitions: int | None = None,
    limit_bytes: int | None = None,
) -> Any:
    """Perceptual near-duplicate image pairs -> Dataset[a, b, hamming].

    One actor-pool aHash pass over the binary column (only the 16 B
    (id, phash) projection survives it — image bytes never ride any
    exchange), then the shared banded-fingerprint spine
    (:func:`patito_ray.functions.dedup.fingerprint_near_dups`) with its
    pigeonhole recall guarantee at hamming <= bands - 1.
    """
    from patito_ray.functions.dedup import fingerprint_near_dups

    hashes = ds.map_batches(
        ImagePHash(image_col=image_col),
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=_MEDIA_ACTOR_CPUS,
    )

    def narrow(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kv = pa.table({id_col: t.column(id_col), "phash": t.column("phash")})
        if kv.column("phash").null_count:
            kv = kv.filter(pc.is_valid(kv.column("phash")))
        return kv

    fps = hashes.map_batches(narrow, batch_format="pyarrow", batch_size=None)
    return fingerprint_near_dups(
        fps,
        id_col,
        "phash",
        max_hamming=max_hamming,
        bands=bands,
        num_partitions=num_partitions,
        limit_bytes=limit_bytes,
    )


class AudioFingerprint:
    """binary WAV -> 64-bit energy fingerprint (int64 column ``afp``).

    Real decode path (PCM WAV via the stdlib codec): split the clip
    into 64 equal windows, take each window's RMS energy, threshold at
    the clip's median energy, pack the 64 bits. Amplitude scaling and
    small edits preserve the relative energy profile, so near-identical
    clips land within a few bits. Null payloads yield null prints.
    """

    def __init__(self, audio_col: str = "audio") -> None:
        self.audio_col = audio_col
        from patito_ray.functions import codecs

        self._decode = codecs.decode_wav
        self._weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column(self.audio_col)
        prints: list[int | None] = []
        for b in payload.to_pylist():
            if b is None:
                prints.append(None)
                continue
            samples, _rate = self._decode(b)
            x = samples.astype(np.float64)
            n = len(x) - (len(x) % 64)
            if n == 0:
                prints.append(0)
                continue
            rms = np.sqrt((x[:n].reshape(64, -1) ** 2).mean(axis=1))
            bits = (rms > np.median(rms)).astype(np.uint64)
            prints.append(int((bits * self._weights).sum().view(np.int64)))
        return batch.append_column("afp", pa.array(prints, type=pa.int64()))


def audio_near_dups(
    ds: Any,
    id_col: str = "doc_id",
    audio_col: str = "audio",
    max_hamming: int = 3,
    bands: int = 4,
    concurrency: int = 4,
    num_partitions: int | None = None,
    limit_bytes: int | None = None,
) -> Any:
    """Near-duplicate audio pairs -> Dataset[a, b, hamming]: actor-pool
    energy fingerprints (16 B (id, afp) projection — audio bytes never
    ride an exchange), then the shared banded-fingerprint spine."""
    from patito_ray.functions.dedup import fingerprint_near_dups

    prints = ds.map_batches(
        AudioFingerprint(audio_col=audio_col),
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=_MEDIA_ACTOR_CPUS,
    )

    def narrow(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kv = pa.table({id_col: t.column(id_col), "afp": t.column("afp")})
        if kv.column("afp").null_count:
            kv = kv.filter(pc.is_valid(kv.column("afp")))
        return kv

    fps = prints.map_batches(narrow, batch_format="pyarrow", batch_size=None)
    return fingerprint_near_dups(
        fps,
        id_col,
        "afp",
        max_hamming=max_hamming,
        bands=bands,
        num_partitions=num_partitions,
        limit_bytes=limit_bytes,
    )


class VideoFrameSample:
    """binary video -> (n_frames, fps, duration_s, frame_lumas) columns:
    parse the container index (cheap — no pixels), pick ``frames``
    evenly spaced keyframes, decode ONLY those (real PNG decode via the
    stdlib codecs for MPNG payloads) and emit each sampled frame's mean
    luma as a list<float64>. The container-parse-then-selective-decode
    split is the shape that matters at scale: a 2-hour video's index is
    bytes, its pixels are gigabytes. ``fake=True`` derives metadata from
    the payload hash (plumbing-only mode); real non-MPNG containers
    (MP4/WebM) raise NotImplementedError naming ffmpeg at the exact
    call site. Null payloads yield null metadata."""

    def __init__(
        self, frames: int = 3, fake: bool = True, video_col: str = "video"
    ) -> None:
        self.frames = frames
        self.fake = fake
        self.video_col = video_col
        if not fake:
            from patito_ray.functions import codecs

            self._index = codecs.parse_mpng_index
            self._frame = codecs.decode_video_frame
            self._gray = codecs.to_gray

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column(self.video_col)
        if self.fake:
            h = hash64(payload)
            n_frames = (h % np.uint64(240) + np.uint64(10)).astype(np.int64)
            fps = np.full(len(h), 10, np.int64)
            lumas = [
                [float((int(x) >> (8 * i)) & 0xFF) for i in range(self.frames)]
                for x in h
            ]
        else:
            n_frames_l: "list[Any]" = []
            fps_l: "list[Any]" = []
            lumas = []
            for blob in payload.to_pylist():
                if blob is None:
                    n_frames_l.append(None)
                    fps_l.append(None)
                    lumas.append(None)
                    continue
                if blob[:4] != b"MPNG":
                    raise NotImplementedError(
                        "real decode for non-MPNG video containers needs "
                        "ffmpeg (not in this environment); payload starts "
                        f"with {blob[:4]!r}"
                    )
                n, fps_v, spans = self._index(blob)
                picks = [
                    spans[min(n - 1, (i + 1) * n // (self.frames + 1))]
                    for i in range(self.frames)
                ]
                row = []
                for off, ln in picks:
                    img = self._frame(blob, off, ln)
                    row.append(float(self._gray(img).mean()))
                n_frames_l.append(n)
                fps_l.append(fps_v)
                lumas.append(row)
            n_frames = n_frames_l  # type: ignore[assignment]
            fps = fps_l  # type: ignore[assignment]
        out = batch.append_column(
            "n_frames", pa.array(n_frames, type=pa.int64())
        ).append_column("fps", pa.array(fps, type=pa.int64()))
        nf = out.column("n_frames").to_numpy(zero_copy_only=False).astype(np.float64)
        fp = out.column("fps").to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            dur = np.where(fp > 0, nf / fp, np.nan)
        return out.append_column(
            "duration_s", pa.array([None if d != d else float(d) for d in dur], pa.float64())
        ).append_column("frame_lumas", pa.array(lumas, type=pa.list_(pa.float64())))


def sample_video_frames(
    ds: Any, frames: int = 3, concurrency: int = 4, fake: bool = True
) -> Any:
    return ds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"fake": fake, "frames": frames},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=_MEDIA_ACTOR_CPUS,
    )


def synth_video_batch(
    batch: pa.Table, id_col: str = "doc_id", n_frames: int = 6
) -> pa.Table:
    """Deterministic MPNG payloads from an id column: ``n_frames`` tiny
    RGB frames whose gradient phase advances per frame (real PNG
    encoder, real container) — the video analogue of synth_media_batch."""
    from patito_ray.functions import codecs as cx

    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    yy, xx = np.mgrid[0:8, 0:8].astype(np.float64)
    vids = []
    for i in ids:
        frames = []
        for f in range(n_frames):
            phase = ((i * 31 + f * 17) % 89) / 89.0
            img = np.empty((8, 8, 3), np.uint8)
            img[:, :, 0] = ((xx / 8 + phase) * 255) % 256
            img[:, :, 1] = ((yy / 8 + phase / 3) * 255) % 256
            img[:, :, 2] = ((i + f) % 256)
            frames.append(img)
        vids.append(cx.encode_mpng(frames, fps=10))
    return batch.append_column("video", pa.array(vids, type=pa.binary()))
