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
