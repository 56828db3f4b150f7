"""Video container plumbing (MPNG codecs + VideoFrameSample): real
container parse + selective keyframe decode, fake-mode schema parity,
corrupt/foreign-container errors."""

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.functions import codecs as cx
from patito_ray.functions.multimodal import (
    VideoFrameSample,
    sample_video_frames,
    synth_video_batch,
)


def _frames(n=5, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(n)]


def test_mpng_roundtrip_and_index():
    frames = _frames(5)
    blob = cx.encode_mpng(frames, fps=12)
    n, fps, spans = cx.parse_mpng_index(blob)
    assert (n, fps, len(spans)) == (5, 12, 5)
    for (off, ln), f in zip(spans, frames):
        got = cx.decode_video_frame(blob, off, ln)
        assert np.array_equal(got, f)
    with pytest.raises(ValueError, match="magic"):
        cx.parse_mpng_index(b"RIFF" + blob[4:])
    with pytest.raises(ValueError, match="trailing"):
        cx.parse_mpng_index(blob + b"x")
    with pytest.raises(ValueError, match="at least one"):
        cx.encode_mpng([], fps=10)


def test_video_frame_sample_real_mode():
    t = pa.table({"doc_id": pa.array(np.arange(7), pa.int64())})
    media = synth_video_batch(t, n_frames=6)
    out = VideoFrameSample(frames=3, fake=False)(media)
    assert out.column("n_frames").to_pylist() == [6] * 7
    assert out.column("fps").to_pylist() == [10] * 7
    assert out.column("duration_s").to_pylist() == [0.6] * 7
    lumas = out.column("frame_lumas").to_pylist()
    assert all(len(r) == 3 and all(0.0 <= v <= 255.0 for v in r) for r in lumas)
    # deterministic across batch splits
    again = VideoFrameSample(frames=3, fake=False)(media.slice(3, 4))
    assert again.column("frame_lumas").to_pylist() == lumas[3:]

    # null payload -> null metadata
    two = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "video": pa.array([media.column("video")[0].as_py(), None], pa.binary()),
        }
    )
    out2 = VideoFrameSample(frames=3, fake=False)(two)
    assert out2.column("n_frames").to_pylist()[1] is None
    assert out2.column("duration_s").to_pylist()[1] is None
    assert out2.column("frame_lumas").to_pylist()[1] is None

    with pytest.raises(NotImplementedError, match="ffmpeg"):
        VideoFrameSample(fake=False)(
            pa.table(
                {"video": pa.array([b"\x00\x00\x00\x18ftypmp42"], pa.binary())}
            )
        )


def test_video_frame_sample_fake_and_dataset(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(np.arange(40), pa.int64())})
    media = synth_video_batch(t, n_frames=4)
    ds = rd.from_arrow(media).repartition(4)
    fake = sample_video_frames(ds, frames=3, concurrency=1, fake=True).to_pandas()
    real = sample_video_frames(ds, frames=3, concurrency=1, fake=False).to_pandas()
    assert list(fake.columns) == list(real.columns)
    assert len(fake) == len(real) == 40
    assert (real["n_frames"] == 4).all()
