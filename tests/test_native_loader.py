import io

import numpy as np
import pytest

from holocron_tpu.utils.data._native import decode_batch, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="native loader unavailable (no g++/libjpeg)")


def _jpeg(arr, quality=98):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_decode_batch_matches_pil_on_smooth_images():
    from PIL import Image

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack([(xx / w * 255), (yy / h * 255), ((xx + yy) / (h + w) * 255)], -1).astype(np.uint8)
    raw = _jpeg(arr)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    out = decode_batch([raw, raw], 64, 64, mean, std)
    assert out.shape == (2, 64, 64, 3) and out.dtype == np.float32
    pil = Image.open(io.BytesIO(raw)).convert("RGB").resize((64, 64), Image.BILINEAR)
    ref = (np.asarray(pil, np.float32) / 255.0 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    assert np.abs(out[0] - ref).mean() < 0.01
    np.testing.assert_allclose(out[0], out[1])


def test_decode_batch_mixed_sizes_and_threads():
    rng = np.random.default_rng(0)
    raws = [_jpeg(rng.integers(0, 255, (32 + 8 * i, 40, 3)).astype(np.uint8)) for i in range(5)]
    out = decode_batch(raws, 16, 16, (0, 0, 0), (1, 1, 1), num_threads=3)
    assert out.shape == (5, 16, 16, 3)
    assert np.isfinite(out).all()


def test_decode_batch_bad_jpeg():
    with pytest.raises(ValueError):
        decode_batch([b"not a jpeg"], 16, 16, (0, 0, 0), (1, 1, 1))


def test_decode_batch_u8_matches_f32_path():
    """The serving hot path's uint8 decode+resize, normalized afterwards, must agree
    with the fused float32 path (same bilinear): the only extra error is the uint8
    rounding of the resized pixel (<= 0.5/255 pre-normalize)."""
    from holocron_tpu.utils.data._native import decode_batch_u8

    h, w = 100, 140
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack([(xx / w * 255), (yy / h * 255), ((xx * yy) % 255)], -1).astype(np.uint8)
    raw = _jpeg(arr)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    u8 = decode_batch_u8([raw, raw], 64, 64)
    assert u8.shape == (2, 64, 64, 3) and u8.dtype == np.uint8
    np.testing.assert_array_equal(u8[0], u8[1])
    norm = (u8.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    f32 = decode_batch([raw], 64, 64, mean, std)
    # 0.5/255 quantization / min std ~0.22 ≈ 0.0089 max deviation
    assert np.abs(norm[0] - f32[0]).max() < 0.01

    with pytest.raises(ValueError):
        decode_batch_u8([b"not a jpeg"], 16, 16)


def test_decode_rrc_batch_shapes_and_determinism():
    from holocron_tpu.utils.data._native import decode_rrc_batch

    rng = np.random.default_rng(0)
    raws = [_jpeg(rng.integers(0, 255, (80 + 16 * i, 100, 3)).astype(np.uint8)) for i in range(4)]
    seeds = [11, 22, 33, 44]
    out = decode_rrc_batch(raws, 48, 48, scale=(0.3, 1.0), seeds=seeds, num_threads=2)
    assert out.shape == (4, 48, 48, 3) and out.dtype == np.uint8
    # deterministic given seeds
    out2 = decode_rrc_batch(raws, 48, 48, scale=(0.3, 1.0), seeds=seeds, num_threads=4)
    np.testing.assert_array_equal(out, out2)
    # different seeds -> different crops (with overwhelming probability)
    out3 = decode_rrc_batch(raws, 48, 48, scale=(0.3, 1.0), seeds=[s + 1 for s in seeds])
    assert not np.array_equal(out, out3)


def test_decode_rrc_full_scale_no_flip_matches_plain_resize():
    # scale=(1,1), ratio pinned to the image's own aspect, flip_prob=0: the crop is
    # the full image, so the output must equal a plain bilinear resize
    from holocron_tpu.utils.data._native import decode_rrc_batch

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack([(xx / w * 255), (yy / h * 255), ((xx + yy) / (h + w) * 255)], -1).astype(np.uint8)
    raw = _jpeg(arr)
    ar = w / h
    out = decode_rrc_batch([raw], 64, 64, scale=(1.0, 1.0), ratio=(ar, ar), flip_prob=0.0, seeds=[7])
    ref = decode_batch([raw], 64, 64, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    np.testing.assert_allclose(out[0].astype(np.float32) / 255.0, ref[0], atol=0.02)


def test_decode_rrc_flip_prob_one_mirrors():
    from holocron_tpu.utils.data._native import decode_rrc_batch

    h, w = 64, 64
    xx = np.tile(np.arange(w, dtype=np.uint8) * 3, (h, 1))
    arr = np.stack([xx, xx, xx], -1)
    raw = _jpeg(arr)
    ar = 1.0
    flipped = decode_rrc_batch([raw], 32, 32, scale=(1.0, 1.0), ratio=(ar, ar), flip_prob=1.0, seeds=[5])
    plain = decode_rrc_batch([raw], 32, 32, scale=(1.0, 1.0), ratio=(ar, ar), flip_prob=0.0, seeds=[5])
    np.testing.assert_allclose(
        flipped[0].astype(np.int32), plain[0, :, ::-1].astype(np.int32), atol=2
    )


def test_decode_rrc_crop_areas_respect_scale():
    # statistically: with scale=(0.9, 1.0), outputs come from >=90% of the image; with
    # scale=(0.05, 0.1), crops are small -> outputs differ strongly between the two
    from holocron_tpu.utils.data._native import decode_rrc_batch

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
    raw = _jpeg(arr)
    big = decode_rrc_batch([raw] * 8, 32, 32, scale=(0.99, 1.0), ratio=(1.0, 1.0), flip_prob=0.0,
                           seeds=list(range(1, 9)))
    # near-full-image crops at fixed aspect are nearly identical across seeds
    spread_big = np.abs(big.astype(np.int32) - big[0].astype(np.int32)).mean()
    small = decode_rrc_batch([raw] * 8, 32, 32, scale=(0.02, 0.05), ratio=(1.0, 1.0), flip_prob=0.0,
                             seeds=list(range(1, 9)))
    spread_small = np.abs(small.astype(np.int32) - small[0].astype(np.int32)).mean()
    assert spread_small > spread_big * 2
