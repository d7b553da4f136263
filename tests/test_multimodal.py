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


def test_avi_roundtrip_exact():
    from medcat_ray.ops.multimodal import decode_avi, encode_avi
    rng = np.random.default_rng(11)
    # odd width → DIB rows need padding; exercises stride logic
    frames = rng.integers(0, 256, size=(5, 6, 7, 3), dtype=np.uint8)
    data = encode_avi(frames, fps=12)
    back, fps = decode_avi(data)
    assert fps == 12.0
    assert back.shape == frames.shape
    assert np.array_equal(back, frames)
    # non-AVI RIFF (WAV) and garbage → None, not a crash
    assert decode_avi(_make_wav(np.zeros(10, dtype=np.int16))) is None
    assert decode_avi(b"not a video") is None


def test_video_stage_avi_exact_and_fake(ray_session):
    import ray.data as rd
    from medcat_ray.ops.multimodal import encode_avi, sample_video_frames
    # 4 solid-color frames: per-frame means are the planted colors
    frames = np.stack([np.full((4, 5, 3), (10 * f, 20 * f, 30 * f),
                               dtype=np.uint8) for f in range(4)])
    ds = rd.from_items([
        {"vid": 1, "data": encode_avi(frames, fps=10)},
        {"vid": 2, "data": b"\x00\x01\x02 opaque codec"},
    ])
    out = sample_video_frames(ds, n_frames=2, concurrency=1) \
        .to_pandas().set_index("vid")
    real = out.loc[1]
    assert real["decoder"] == "avi"
    assert (real["width"], real["height"], real["n_frames_total"]) == (5, 4, 4)
    assert real["fps"] == 10.0
    # idx_i = ((2i+1)*4)//(2*2) → frames 1 and 3
    assert list(real["frame_indices"]) == [1, 3]
    got = [list(m) for m in real["frame_means"]]
    assert got == [[10.0, 20.0, 30.0], [30.0, 60.0, 90.0]]
    fake = out.loc[2]
    assert fake["decoder"] == "fake" and fake["n_frames_total"] >= 2
    # strict mode refuses undecodable payloads
    from medcat_ray.ops.multimodal import VideoFrameSampleStage
    import pyarrow as pa
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(strict=True)(
            pa.table({"data": pa.array([b"nope"], type=pa.binary())}))


def test_video_sampling_short_video():
    """Videos with fewer frames than n_frames sample each frame once."""
    import pyarrow as pa
    from medcat_ray.ops.multimodal import VideoFrameSampleStage, encode_avi
    frames = np.full((1, 2, 2, 3), 9, dtype=np.uint8)
    out = VideoFrameSampleStage(n_frames=4)(
        pa.table({"data": pa.array([encode_avi(frames)], type=pa.binary())}))
    row = out.to_pylist()[0]
    assert row["frame_indices"] == [0]
    assert row["frame_means"] == [[9.0, 9.0, 9.0]]


def test_ahash64_hand_computed():
    """4x4 gradient, integer twin computed by hand rules."""
    import numpy as np
    from medcat_ray.ops.multimodal import ahash64
    g = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.repeat(g[:, :, None], 3, axis=2)
    ys = ((2 * np.arange(8) + 1) * 16) // 16
    s = g[np.ix_(ys, ys)].astype(np.int64)
    m = int(s.sum()) // 64
    want = sum(1 << (y * 8 + x)
               for y in range(8) for x in range(8)
               if s[y, x] > m)
    assert ahash64(img) == want
    # grayscale 2-D input takes the same path
    assert ahash64(g) == want


def test_image_near_dup_pairs_planted(ray_session):
    import numpy as np
    import ray.data as rd
    from medcat_ray.ops.multimodal import encode_ppm, image_near_dup_pairs
    rng = np.random.default_rng(3)
    rows = []
    for i in range(12):
        px = rng.integers(0, 256, size=(20, 24, 3)).astype(np.uint8)
        rows.append({"doc_id": i, "data": encode_ppm(px)})
        if i < 3:  # exact pixel copies -> hamming 0
            rows.append({"doc_id": 100 + i, "data": encode_ppm(px)})
    ds = rd.from_items(rows).repartition(3)
    out = image_near_dup_pairs(ds, strict=True).to_pandas()
    zero = out[out["hamming"] == 0]
    assert {(int(a), int(b)) for a, b in zip(zero["id_a"], zero["id_b"])} \
        >= {(0, 100), (1, 101), (2, 102)}
    # every reported pair honors the criterion
    assert (out["hamming"] <= 3).all()


def test_image_ahash_strict_raises(ray_session):
    import pytest
    import ray.data as rd
    from medcat_ray.ops.multimodal import add_image_ahash
    ds = rd.from_items([{"doc_id": 0, "data": b"not an image"}])
    with pytest.raises(Exception, match="netpbm"):
        add_image_ahash(ds, strict=True).take_all()
    # non-strict: row silently dropped from the hash stream
    assert add_image_ahash(ds, strict=False).count() == 0


def test_audio_fp64_hand_computed():
    """64-segment block wave: segment energies equal the block amplitudes
    exactly, bits follow the floor-mean midpoint rule."""
    from medcat_ray.ops.multimodal import audio_fp64
    amps = np.array([(k * k * 7 + 13) % 1000 for k in range(64)],
                    dtype=np.int64)
    samples = np.repeat(amps, 32)        # n = 2048, segment = p // 32
    m = int(amps.sum()) // 64
    want = sum(1 << k for k in range(64) if amps[k] > m)
    assert audio_fp64(samples) == want
    # |amplitude|: a global sign flip leaves the fingerprint unchanged
    assert audio_fp64(-samples) == want
    assert audio_fp64(np.array([], dtype=np.int64)) == 0


def test_decode_wav_int_exact_and_stereo():
    import io
    import wave as wmod
    from medcat_ray.ops.multimodal import decode_wav_int, encode_wav
    s = np.array([-32768, -1, 0, 1, 32767], dtype=np.int64)
    got, rate = decode_wav_int(encode_wav(s, rate=16000))
    assert rate == 16000 and np.array_equal(got, s)
    # stereo collapses by floor-division mean
    buf = io.BytesIO()
    with wmod.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        inter = np.array([10, 21, -5, -6], dtype="<i2")  # 2 frames
        wf.writeframes(inter.tobytes())
    got, _ = decode_wav_int(buf.getvalue())
    assert got.tolist() == [(10 + 21) // 2, (-5 + -6) // 2]
    assert decode_wav_int(b"not audio") is None


def test_audio_near_dup_pairs_planted(ray_session):
    import ray.data as rd
    from medcat_ray.ops.multimodal import (audio_near_dup_pairs,
                                           encode_wav)
    rng = np.random.default_rng(5)
    rows = []
    for i in range(12):
        s = rng.integers(-3000, 3000, size=2048).astype(np.int64)
        rows.append({"doc_id": i, "data": encode_wav(s)})
        if i < 3:      # exact sample copies -> hamming 0
            rows.append({"doc_id": 100 + i, "data": encode_wav(s)})
    ds = rd.from_items(rows).repartition(3)
    out = audio_near_dup_pairs(ds, strict=True).to_pandas()
    zero = out[out["hamming"] == 0]
    assert {(int(a), int(b)) for a, b in zip(zero["id_a"], zero["id_b"])} \
        >= {(0, 100), (1, 101), (2, 102)}
    assert (out["hamming"] <= 3).all()


def test_audio_fingerprint_strict_raises(ray_session):
    import ray.data as rd
    from medcat_ray.ops.multimodal import add_audio_fingerprint
    ds = rd.from_items([{"doc_id": 0, "data": b"not audio"}])
    with pytest.raises(Exception, match="WAV"):
        add_audio_fingerprint(ds, strict=True).take_all()
    assert add_audio_fingerprint(ds, strict=False).count() == 0


def test_truncated_payloads_fall_through_not_crash(ray_session):
    """A payload that merely STARTS like P6/BM/RIFF but is truncated or
    an unsupported variant must fall through to the fake decoder under
    strict=False (one bad row must not crash the stage) and raise only
    under strict=True."""
    import pyarrow as pa
    import ray.data as rd
    from medcat_ray.ops.multimodal import (decode_images, try_decode,
                                           decode_netpbm, decode_bmp)
    bad = [b"P6\n5 5\n255\n" + b"\x00" * 3,   # truncated samples
           b"P6\n5",                           # truncated header
           b"P5\n2 2\n",                       # missing maxval field
           b"BM" + b"\x00" * 60,               # 0bpp "BMP"
           b"RIFF1234WAVE"]                    # truncated WAV
    for payload in bad[:4]:
        assert try_decode(decode_netpbm, payload) is None or \
            try_decode(decode_bmp, payload) is None
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(bad))),
        "data": pa.array(bad, type=pa.binary())}))
    out = decode_images(ds, strict=False, concurrency=1).to_pandas()
    assert len(out) == len(bad)
    assert all(m["decoder"] == "fake" for m in out["image_meta"])
    import pytest
    with pytest.raises(Exception, match="truncat|unsupported|invalid|"
                       "cannot|not a|negative|buffer|out of range"):
        decode_images(ds, strict=True, concurrency=1).materialize()
