"""Multimodal actor-stage plumbing: resize / frame-sample / embed."""

import hashlib

import numpy as np
import pyarrow as pa


def _refs_table(refs):
    return pa.table({"media_ref": pa.array(refs, pa.string())})


REF = "synth://scan_single/000000ab/0/3"


def test_media_resize_contract():
    from automatic_reference_extractor_ray.ops.multimodal import MediaResize
    from automatic_reference_extractor_ray.sources.media_store import (
        SynthMediaStore)
    n = len(SynthMediaStore().fetch(REF))
    out = MediaResize(max_bytes=100)(_refs_table([REF]))
    assert out.column("n_bytes_out").to_pylist() == [min(n, 100)]
    assert out.column("resized").to_pylist() == [n > 100]
    out2 = MediaResize()(_refs_table([REF]))     # default cap not reached
    assert out2.column("resized").to_pylist() == [False]


def test_frame_sample_fanout_and_determinism():
    from automatic_reference_extractor_ray.ops.multimodal import FrameSample
    from automatic_reference_extractor_ray.sources.media_store import (
        SynthMediaStore)
    out = FrameSample(n_frames=4)(_refs_table([REF]))
    assert out.num_rows == 4
    assert out.column("frame_no").to_pylist() == [0, 1, 2, 3]
    p = SynthMediaStore().fetch(REF)
    step = max(1, len(p) // 4)
    expect = [hashlib.md5(p[f * step:(f + 1) * step]).hexdigest()
              for f in range(4)]
    assert out.column("frame_md5").to_pylist() == expect


def test_text_embedder_batched_and_normalized():
    from automatic_reference_extractor_ray.ops.multimodal import TextEmbedder
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["hash join scan", "", "hash join scan"])})
    out = TextEmbedder(dim=32)(t)
    vecs = [np.asarray(v, np.float32) for v in
            out.column("embedding").to_pylist()]
    assert np.isclose(np.linalg.norm(vecs[0]), 1.0)
    assert np.linalg.norm(vecs[1]) == 0.0          # empty text → zero vec
    assert np.allclose(vecs[0], vecs[2])           # deterministic


def _pil_available():
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


def test_real_decoder_gate():
    """Without Pillow the real decoder fails at CONSTRUCTION with a
    precise ImportError (never mid-batch); with it, the interface
    contract matches the fake's feature dict plus image dims."""
    import pytest

    from automatic_reference_extractor_ray.ops.multimodal import (
        FakeDecoder, RealImageDecoder)
    payload = b"not really an image"
    fake = FakeDecoder().decode(payload)
    assert set(fake) == {"n_bytes", "payload_md5"}
    if not _pil_available():
        with pytest.raises(ImportError, match="Pillow"):
            RealImageDecoder()
        pytest.skip("Pillow not installed - real decoder gated off")
    d = RealImageDecoder()           # pragma: no cover (codec envs only)
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (8, 4)).save(buf, format="PNG")
    feat = d.decode(buf.getvalue())
    assert feat["width"] == 8 and feat["height"] == 4
    assert feat["n_bytes"] == len(buf.getvalue())


def test_tesseract_gate():
    import pytest

    from automatic_reference_extractor_ray.ops.multimodal import (
        ocr_image_to_hocr, tesseract_available)
    if not tesseract_available():
        with pytest.raises(RuntimeError, match="tesseract"):
            ocr_image_to_hocr(b"")
        pytest.skip("tesseract not installed - real OCR gated off")


def test_media_resize_rejects_unknown_codec():
    import pytest

    from automatic_reference_extractor_ray.ops.multimodal import MediaResize
    with pytest.raises(ValueError, match="unknown codec"):
        MediaResize(codec="webp")
