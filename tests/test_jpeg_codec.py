"""Baseline JPEG codec (functions/codecs.py): round trips, known
vectors, container interop with the image stages.

There is no libjpeg in this container to cross-check against, so
correctness evidence is (a) analytically known bitstreams (a flat
gray block's entropy data is hand-computable from the Annex-K tables),
(b) PSNR bounds on encode->decode round trips per subsampling/quality,
(c) invariances (restart markers must not change pixels), and (d) the
decoder consuming only what the spec defines (tables come from the
file's own DQT/DHT segments, so marker parsing is exercised end to
end).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from patito_ray.functions import codecs as cx


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)


def test_flat_gray_block_known_vector():
    """All-128 8x8 gray: every coefficient is zero, so the entropy data
    is exactly DC-category-0 ('00') + EOB ('1010') + 1-padding = 0x2B,
    and decode returns the input bit-exactly (hand-checkable against
    T.81 Annex K)."""
    img = np.full((8, 8), 128, np.uint8)
    blob = cx.encode_jpeg(img, quality=85)
    assert cx.sniff_format(blob) == "jpeg"
    sos = blob.rindex(b"\xff\xda")
    (slen,) = struct.unpack_from(">H", blob, sos + 2)
    entropy = blob[sos + 2 + slen : -2]
    assert entropy == b"\x2b"
    out = cx.decode_jpeg(blob)
    assert out.shape == (8, 8, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_flat_color_exact():
    """A flat color image survives exactly: only DC terms, quantized
    losslessly (DC quant step divides the constant's coefficient error
    under round-to-nearest by construction of the check)."""
    img = np.full((16, 24, 3), [200, 64, 128], np.uint8)
    out = cx.decode_jpeg(cx.encode_jpeg(img, quality=95, subsampling="444"))
    assert out.shape == img.shape
    # flat fields survive within +-1 (color transform rounding)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


@pytest.mark.parametrize("ss", ["444", "420"])
@pytest.mark.parametrize("quality,floor", [(95, 42), (85, 40), (60, 35)])
def test_roundtrip_psnr(ss, quality, floor):
    img = _gradient(40, 52)
    out = cx.decode_jpeg(cx.encode_jpeg(img, quality=quality, subsampling=ss))
    assert out.shape == img.shape
    assert _psnr(img, out) >= floor


def test_odd_sizes_crop_back():
    """Dimensions not divisible by 8 (or 16 for 4:2:0) pad at encode
    and crop at decode — output shape must equal input shape."""
    for h, w in [(9, 13), (17, 31), (8, 9), (33, 47)]:
        img = _gradient(h, w)
        for ss in ("444", "420"):
            out = cx.decode_jpeg(cx.encode_jpeg(img, 90, ss))
            assert out.shape == (h, w, 3), (h, w, ss)


def test_grayscale_roundtrip():
    g = (np.mgrid[0:30, 0:41][0] * 5 % 256).astype(np.uint8)
    out = cx.decode_jpeg(cx.encode_jpeg(g, quality=90))
    assert out.shape == (30, 41, 1)
    assert _psnr(g[:, :, None], out) >= 45


def test_restart_markers_do_not_change_pixels():
    img = _gradient(50, 70)
    for ss in ("444", "420"):
        plain = cx.decode_jpeg(cx.encode_jpeg(img, 85, ss))
        withr = cx.decode_jpeg(cx.encode_jpeg(img, 85, ss, restart_interval=3))
        assert np.array_equal(plain, withr)
        blob = cx.encode_jpeg(img, 85, ss, restart_interval=3)
        assert b"\xff\xdd" in blob  # DRI segment present
        assert b"\xff\xd0" in blob  # at least one RST0


def test_noise_highest_quality():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = cx.decode_jpeg(cx.encode_jpeg(img, quality=100, subsampling="444"))
    assert _psnr(img, out) >= 40  # q100 keeps even noise close


def test_progressive_rejected_clearly():
    """A SOF2 (progressive) marker must raise NotImplementedError with
    the reason, not garbage output."""
    blob = bytearray(cx.encode_jpeg(np.full((8, 8), 128, np.uint8)))
    sof = blob.index(b"\xff\xc0")
    blob[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive|SOF"):
        cx.decode_jpeg(bytes(blob))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        cx.decode_jpeg(b"\x00\x01\x02\x03")


def test_decode_image_dispatches_jpeg():
    img = _gradient(16, 16)
    out = cx.decode_image(cx.encode_jpeg(img, 90))
    assert out.shape == (16, 16, 3)
    assert _psnr(img, out) >= 35


def test_phash_stable_across_containers():
    """The near-dup invariant JPEG unlocks: the SAME picture stored as
    PNG vs JPEG(q90) vs BMP must land within a few pHash bits; distinct
    pictures stay far apart."""
    import pyarrow as pa

    from patito_ray.functions.multimodal import ImagePHash

    imgs = [_gradient(24, 32), 255 - _gradient(24, 32)]
    payloads, ids = [], []
    for k, im in enumerate(imgs):
        for enc in (
            cx.encode_png(im),
            cx.encode_bmp(im),
            cx.encode_jpeg(im, quality=90, subsampling="420"),
        ):
            payloads.append(enc)
            ids.append(k)
    tab = pa.table(
        {"doc_id": pa.array(range(len(ids)), pa.int64()),
         "image": pa.array(payloads, pa.binary())}
    )
    hashes = ImagePHash()(tab).column("phash").to_pylist()

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    for base in (0, 3):
        for other in range(base + 1, base + 3):
            assert ham(hashes[base], hashes[other]) <= 3
    assert ham(hashes[0], hashes[3]) >= 20
