"""Real builtin multimodal decoders: netpbm/BMP images (pure numpy) and
PCM WAV audio (stdlib wave) — exact round-trips, plus the actor-pool
stages over mixed decodable/opaque payloads."""

import io
import struct
import wave

import numpy as np
import pytest


def _make_bmp(pixels: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit bottom-up BMP encoder (test-local)."""
    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in pixels[::-1]:                     # bottom-up
        r = row[:, ::-1].astype(np.uint8).tobytes()  # RGB→BGR
        body += r + b"\x00" * (stride - len(r))
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + bytes(body)


def _make_wav(samples_i16: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples_i16.astype("<i2").tobytes())
    return buf.getvalue()


def test_ppm_roundtrip_exact():
    from medcat_ray.ops.multimodal import decode_netpbm, encode_ppm
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    out, mode = decode_netpbm(encode_ppm(px))
    assert mode == "RGB"
    assert np.array_equal(out, px)


def test_pgm_and_header_comments():
    from medcat_ray.ops.multimodal import decode_netpbm
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    data = b"P5\n# a comment\n4 3\n255\n" + px.tobytes()
    out, mode = decode_netpbm(data)
    assert mode == "L"
    assert np.array_equal(out, px)
    assert decode_netpbm(b"not an image") is None


def test_bmp_decode_exact():
    from medcat_ray.ops.multimodal import decode_bmp
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)  # w=5: padding
    out, mode = decode_bmp(_make_bmp(px))
    assert mode == "RGB"
    assert np.array_equal(out, px)
    assert decode_bmp(b"BM but short") is None
    with pytest.raises(ValueError):
        bad = bytearray(_make_bmp(px))
        bad[30:34] = struct.pack("<I", 1)        # RLE8 compression flag
        from medcat_ray.ops.multimodal import decode_bmp as d
        d(bytes(bad))


def test_wav_decode_exact():
    from medcat_ray.ops.multimodal import decode_wav
    sq = np.tile(np.array([8192, -8192], dtype=np.int16), 400)  # 800 samples
    samples, rate = decode_wav(_make_wav(sq, rate=8000))
    assert rate == 8000 and len(samples) == 800
    assert np.allclose(np.abs(samples), 0.25)    # 8192/32768 exactly
    assert decode_wav(b"mp3 garbage") is None


def test_image_stage_builtin_and_fake_mixed(ray_session):
    import ray.data as rd
    from medcat_ray.ops.multimodal import decode_images, encode_ppm
    solid = np.full((4, 6, 3), (10, 20, 30), dtype=np.uint8)
    rows = [{"item_id": 0, "data": encode_ppm(solid)},
            {"item_id": 1, "data": _make_bmp(solid)},
            {"item_id": 2, "data": b"\xff\xd8 opaque jpeg-ish"}]
    out = decode_images(rd.from_items(rows), concurrency=1).to_pandas() \
        .sort_values("item_id").reset_index(drop=True)
    assert out["image_meta"][0]["decoder"] == "builtin"
    assert out["image_meta"][1]["decoder"] == "builtin"
    assert out["image_meta"][2]["decoder"] == "fake"
    for i in (0, 1):
        m = out["image_meta"][i]
        assert (m["width"], m["height"], m["mode"]) == (6, 4, "RGB")
        # solid color → per-channel mean is the color, resized to dim 8
        assert list(out["features"][i][:3]) == [10.0, 20.0, 30.0]
        assert list(out["features"][i][3:6]) == [10.0, 20.0, 30.0]


def test_image_resize_nearest_exact(ray_session):
    import ray.data as rd
    from medcat_ray.ops.multimodal import (decode_netpbm, encode_ppm,
                                           resize_images)
    # 4x4 quadrant image → 2x2 picks one pixel per quadrant
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:2, 2:] = 50
    px[2:, :2] = 100
    px[2:, 2:] = 200
    rows = [{"item_id": 0, "data": encode_ppm(px)},
            {"item_id": 1, "data": b"opaque"}]
    out = resize_images(rd.from_items(rows), width=2, height=2,
                        concurrency=1).to_pandas() \
        .sort_values("item_id").reset_index(drop=True)
    assert bool(out["resized"][0]) and not bool(out["resized"][1])
    small, mode = decode_netpbm(out["data"][0])
    assert small.shape == (2, 2, 3)
    assert np.array_equal(small[:, :, 0], [[0, 50], [100, 200]])
    assert out["data"][1] == b"opaque"           # pass-through


def test_audio_stage_wav_exact(ray_session):
    import ray.data as rd
    from medcat_ray.ops.multimodal import sample_audio_frames
    sq = np.tile(np.array([16384, -16384], dtype=np.int16), 1000)  # 2000
    rows = [{"item_id": 0, "data": _make_wav(sq, rate=1000)},
            {"item_id": 1, "data": b"not audio"}]
    out = sample_audio_frames(rd.from_items(rows), concurrency=1) \
        .to_pandas().sort_values("item_id").reset_index(drop=True)
    assert out["decoder"][0] == "wav" and out["decoder"][1] == "fake"
    assert out["duration_sec"][0] == 2.0         # 2000 samples @ 1 kHz
    # constant |amplitude| square wave → RMS = 16384/32768 = 0.5 per frame
    assert np.allclose(out["frame_energy"][0], 0.5)
