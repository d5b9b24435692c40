"""Real-codec path of the multimodal stages.

The fake path is golden-tested via the harness (decode_media_fake /
resize_media_fake / frame_sample_media).  These tests cover the
import-guarded REAL path (VERDICT r03 next-round #8): without the codec
lib the stage must fail loudly at construction (actor __init__), never
mid-stream; with the lib installed the real decode is exercised on a
tiny in-process image so a media-enabled environment validates the
whole chain for free.
"""
import hashlib

import numpy as np
import pytest

from spider_ray.pipelines.multimodal import (
    DecodeImageStage,
    FrameSampleStage,
    ResizeImageStage,
    _import_av,
    _import_pil,
)


@pytest.mark.skipif(_import_pil() is not None, reason="Pillow installed")
def test_image_stages_fail_loudly_without_pillow():
    with pytest.raises(NotImplementedError, match="Pillow"):
        DecodeImageStage(fake=False)
    with pytest.raises(NotImplementedError, match="Pillow"):
        ResizeImageStage(fake=False)


@pytest.mark.skipif(_import_av() is not None, reason="PyAV installed")
def test_video_stage_fails_loudly_without_pyav():
    with pytest.raises(NotImplementedError, match="PyAV"):
        FrameSampleStage(fake=False)


def _png_bytes(w: int, h: int) -> bytes:
    from PIL import Image
    import io

    rng = np.random.default_rng(3)
    img = Image.fromarray(
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8), "RGB"
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.skipif(_import_pil() is None, reason="Pillow not installed")
def test_decode_real_path():
    import pyarrow as pa

    stage = DecodeImageStage(fake=False, target_size=4)
    payload = _png_bytes(20, 10)
    out = stage(
        pa.table({"media_id": [1], "mime": ["image/png"], "payload": [payload]})
    )
    assert out.column("width").to_pylist() == [20]
    assert out.column("height").to_pylist() == [10]
    feat = out.column("feature").to_pylist()[0]
    assert len(feat) == 4 and all(0.0 <= v <= 1.0 for v in feat)


@pytest.mark.skipif(_import_pil() is None, reason="Pillow not installed")
def test_resize_real_path_is_deterministic():
    import pyarrow as pa

    stage = ResizeImageStage(fake=False, target=8)
    payload = _png_bytes(16, 16)
    t = pa.table({"media_id": [1], "payload": [payload]})
    a, b = stage(t), stage(t)
    md5 = a.column("resized_md5").to_pylist()[0]
    assert md5 == b.column("resized_md5").to_pylist()[0]
    assert len(md5) == 32 and md5 != hashlib.md5(payload).hexdigest()
