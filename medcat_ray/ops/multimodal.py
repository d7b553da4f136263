"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

Decode paths, in priority order per payload:

* REAL builtin decoders (no external libs): PPM/PGM (binary netpbm) and
  uncompressed 24/32-bit BMP images decoded with numpy; PCM WAV audio
  decoded with the stdlib ``wave`` module; uncompressed-DIB RIFF/AVI video
  parsed with ``struct`` + numpy.  These are complete, exact decoders —
  not stubs.
* The optional heavy libraries (PIL / torchaudio / ffmpeg) are tried at
  actor ``__init__`` and used for formats the builtins don't cover (JPEG,
  PNG, MP3, …) when present — they are NOT in this container.
* Anything else falls back to a clearly-marked deterministic fake
  (``decoder='fake'``), or raises ``NotImplementedError`` under
  ``strict=True``.

Scale notes: binary payloads dominate block size, so these stages should
run with a small ``batch_size`` (16-64) and rely on
``DataContext.target_max_block_size`` to keep blocks sane; outputs drop the
binary column as early as possible.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd


# ---------------------------------------------------------------------------
# Builtin image codecs (pure numpy — real decoders, no external deps)
# ---------------------------------------------------------------------------


def try_decode(fn, data: bytes, strict: bool = False):
    """Run a builtin decoder, mapping CORRUPT-payload errors (truncated
    header/samples, unsupported variant of a recognized container) to
    "undecodable" (None) so one bad row falls through to the documented
    fake path instead of crashing the whole stage.  Under ``strict=True``
    the original exception propagates (fail-loud)."""
    import struct
    import wave
    try:
        return fn(data)
    except (ValueError, IndexError, EOFError, struct.error, wave.Error):
        if strict:
            raise
        return None


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    h, w = pixels.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + \
        np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_netpbm(data: bytes) -> Optional[Tuple[np.ndarray, str]]:
    """Decode binary PPM (P6, RGB) / PGM (P5, grayscale) → (pixels, mode).

    Returns None if ``data`` is not a binary netpbm payload.  Handles the
    standard header grammar: magic, whitespace/comments, width, height,
    maxval (≤255), one whitespace byte, then raw samples."""
    if not data or data[:2] not in (b"P5", b"P6"):
        return None
    mode = "L" if data[:2] == b"P5" else "RGB"
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":          # comment to end of line
            while pos < len(data) and data[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1                                    # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        return None                             # 16-bit netpbm: unsupported
    ch = 1 if mode == "L" else 3
    need = w * h * ch
    raw = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    pixels = raw.reshape(h, w, ch)
    return (pixels[:, :, 0] if mode == "L" else pixels), mode


def decode_bmp(data: bytes) -> Optional[Tuple[np.ndarray, str]]:
    """Decode an uncompressed 24/32-bit BI_RGB BMP → ((h, w, 3) RGB, mode).

    Returns None for non-BMP payloads; raises ValueError for BMP variants
    outside the uncompressed 24/32-bit case (palettes, RLE)."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp not in (24, 32) or compression != 0:
        raise ValueError(f"unsupported BMP variant: {bpp}bpp "
                         f"compression={compression}")
    nch = bpp // 8
    flipped, h = h > 0, abs(h)                  # positive height = bottom-up
    stride = (w * nch + 3) & ~3                 # rows padded to 4 bytes
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    px = rows[:, :w * nch].reshape(h, w, nch)[:, :, :3][:, :, ::-1]  # BGR→RGB
    return (px[::-1] if flipped else px).copy(), "RGB"


def decode_wav(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """Decode PCM WAV via the stdlib ``wave`` module → (mono float64 in
    [-1, 1], sample_rate).  Returns None for non-WAV payloads."""
    import io
    import wave
    if not data or data[:4] != b"RIFF":
        return None
    with wave.open(io.BytesIO(data)) as wf:
        n, width, nch = wf.getnframes(), wf.getsampwidth(), wf.getnchannels()
        raw = wf.readframes(n)
        rate = wf.getframerate()
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:                            # unsigned 8-bit PCM
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                   - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples, rate

# ---------------------------------------------------------------------------
# Builtin video codec: uncompressed RIFF/AVI with DIB ('00db') frames.
# Real encoder + decoder in stdlib struct + numpy — the uncompressed-AVI
# analogue of the netpbm/BMP/WAV codecs above.  MJPEG/H.264 would need
# ffmpeg (absent); those payloads fall through to the fake sampler.
# ---------------------------------------------------------------------------


def _dib_frame(rgb: np.ndarray) -> bytes:
    """(h, w, 3) RGB → bottom-up BGR DIB bits, rows padded to 4 bytes."""
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    return rows.tobytes()


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as an uncompressed AVI
    (RIFF 'AVI ' / 'vids' 'DIB ' stream / '00db' chunks / idx1)."""
    import struct
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = frames.shape[:3]
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def chunk(fcc: bytes, payload: bytes) -> bytes:
        return fcc + struct.pack("<I", len(payload)) + payload + \
            (b"\x00" if len(payload) & 1 else b"")

    def lst(four: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", four + payload)

    avih = struct.pack("<14I", 1_000_000 // fps, frame_size * fps, 0,
                       0x10,                      # AVIF_HASINDEX
                       n, 0, 1, frame_size, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"DIB " + struct.pack(
        "<10I", 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0) + \
        struct.pack("<4H", 0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_payload, idx, off = b"", b"", 4
    for f in frames:
        movi_payload += chunk(b"00db", _dib_frame(f))
        idx += struct.pack("<4sIII", b"00db", 0x10, off, frame_size)
        off += 8 + frame_size
    body = hdrl + lst(b"movi", movi_payload) + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body


def decode_avi(data: bytes) -> Optional[Tuple[np.ndarray, float]]:
    """Decode an uncompressed-DIB AVI → ((n, h, w, 3) RGB uint8, fps).

    Returns None for non-AVI payloads (including WAV, which is also RIFF);
    raises ValueError for compressed streams the builtin can't handle."""
    import struct
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    info = {"w": None, "h": None, "bpp": 24, "comp": 0,
            "scale": 1, "rate": 0, "usec": 0}
    raw_frames: list = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fcc = data[pos:pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body = pos + 8
            if fcc == b"LIST":
                walk(body + 4, body + size)
            elif fcc == b"avih":
                info["usec"] = struct.unpack_from("<I", data, body)[0]
            elif fcc == b"strh" and data[body:body + 4] == b"vids":
                info["scale"], info["rate"] = \
                    struct.unpack_from("<2I", data, body + 20)
            elif fcc == b"strf" and info["w"] is None:
                (_, info["w"], info["h"], _, info["bpp"], info["comp"]) = \
                    struct.unpack_from("<IiiHHI", data, body)
            elif fcc[2:] in (b"db", b"dc") and size:
                raw_frames.append(data[body:body + size])
            pos = body + size + (size & 1)

    walk(12, len(data))
    if info["w"] is None or not raw_frames:
        return None
    if info["comp"] != 0 or info["bpp"] not in (24, 32):
        raise ValueError(f"unsupported AVI stream: {info['bpp']}bpp "
                         f"compression={info['comp']}")
    w, nch = info["w"], info["bpp"] // 8
    flipped, h = info["h"] > 0, abs(info["h"])
    stride = (w * nch + 3) & ~3
    out = np.empty((len(raw_frames), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(raw_frames):
        rows = np.frombuffer(raw, dtype=np.uint8,
                             count=stride * h).reshape(h, stride)
        px = rows[:, :w * nch].reshape(h, w, nch)[:, :, :3][:, :, ::-1]
        out[i] = px[::-1] if flipped else px
    fps = info["rate"] / info["scale"] if info["scale"] and info["rate"] \
        else (1e6 / info["usec"] if info["usec"] else 0.0)
    return out, float(fps)


IMAGE_META_TYPE = pa.struct([
    ("width", pa.int32()), ("height", pa.int32()),
    ("mode", pa.string()), ("decoder", pa.string()),
])


class ImageDecodeStage:
    """binary image → (width, height, mode) metadata + feature vector.

    Decode priority per payload: builtin netpbm/BMP decoders (real, pure
    numpy) → PIL for other formats when importable (absent here) →
    deterministic fake marked ``decoder='fake'`` (or
    ``NotImplementedError`` under ``strict=True``).  The feature vector is
    the per-channel pixel mean resized to ``feature_dim``."""

    def __init__(self, data_col: str = "data", strict: bool = False,
                 feature_dim: int = 8) -> None:
        self.data_col = data_col
        self.strict = strict
        self.feature_dim = feature_dim
        try:
            from PIL import Image  # noqa: F401  (not in this container)
            self._pil = Image
        except ImportError:
            self._pil = None

    def _fake_decode(self, data: bytes) -> Tuple[int, int, str, np.ndarray]:
        from medcat_ray.ops.hashing import stable_u64
        h = stable_u64(data or b"")
        width = 16 + (h & 0xFF)
        height = 16 + ((h >> 8) & 0xFF)
        rng = np.random.default_rng(h & 0xFFFFFFFF)
        feat = rng.standard_normal(self.feature_dim).astype(np.float32)
        return width, height, "RGB", feat

    def _features(self, pixels: np.ndarray) -> np.ndarray:
        arr = np.asarray(pixels, dtype=np.float32)
        feat = arr.mean(axis=(0, 1)) if arr.ndim == 3 \
            else np.array([arr.mean()], dtype=np.float32)
        return np.resize(feat.astype(np.float32), self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats = [], []
        for data in batch[self.data_col].to_pylist():
            decoded = try_decode(decode_netpbm, data, self.strict) \
                or try_decode(decode_bmp, data, self.strict)
            if decoded is not None:
                pixels, mode = decoded
                h, w = pixels.shape[:2]
                metas.append({"width": w, "height": h, "mode": mode,
                              "decoder": "builtin"})
                feats.append(self._features(pixels).tolist())
                continue
            if self._pil is not None:
                import io
                img = self._pil.open(io.BytesIO(data))
                metas.append({"width": img.width, "height": img.height,
                              "mode": img.mode, "decoder": "pil"})
                feats.append(self._features(
                    np.asarray(img, dtype=np.float32)).tolist())
                continue
            if self.strict:
                raise NotImplementedError(
                    "payload is not netpbm/BMP and PIL is not available; "
                    "run with strict=False for the deterministic fake "
                    "decoder")
            w, h, mode, feat = self._fake_decode(data)
            metas.append({"width": w, "height": h, "mode": mode,
                          "decoder": "fake"})
            feats.append(feat.tolist())
        cols = {name: batch[name] for name in batch.column_names
                if name != self.data_col}  # drop binary payload early
        cols["image_meta"] = pa.array(metas, type=IMAGE_META_TYPE)
        cols["features"] = pa.array(feats, type=pa.list_(pa.float32()))
        return pa.table(cols)


class ImageResizeStage:
    """binary image → nearest-neighbor resize → re-encoded PPM binary.

    A REAL transform for builtin-decodable payloads (netpbm/BMP): index
    the pixel grid at ``round((i + 0.5) * src / dst - 0.5)`` per axis and
    re-encode as P6.  Non-decodable payloads pass through unchanged with
    ``resized=False`` (or raise under ``strict=True``)."""

    def __init__(self, width: int, height: int, data_col: str = "data",
                 strict: bool = False) -> None:
        self.width = width
        self.height = height
        self.data_col = data_col
        self.strict = strict

    def _resize(self, pixels: np.ndarray) -> np.ndarray:
        if pixels.ndim == 2:                    # grayscale → RGB for PPM
            pixels = np.repeat(pixels[:, :, None], 3, axis=2)
        sh, sw = pixels.shape[:2]
        ri = np.clip(np.round((np.arange(self.height) + 0.5) * sh
                              / self.height - 0.5).astype(np.int64),
                     0, sh - 1)
        ci = np.clip(np.round((np.arange(self.width) + 0.5) * sw
                              / self.width - 0.5).astype(np.int64),
                     0, sw - 1)
        return pixels[np.ix_(ri, ci)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, flags = [], []
        for data in batch[self.data_col].to_pylist():
            decoded = try_decode(decode_netpbm, data, self.strict) \
                or try_decode(decode_bmp, data, self.strict)
            if decoded is None:
                if self.strict:
                    raise NotImplementedError(
                        "payload is not netpbm/BMP; cannot resize")
                out.append(data)
                flags.append(False)
                continue
            out.append(encode_ppm(self._resize(decoded[0])))
            flags.append(True)
        cols = {name: batch[name] for name in batch.column_names
                if name != self.data_col}
        cols[self.data_col] = pa.array(out, type=pa.binary())
        cols["resized"] = pa.array(flags, type=pa.bool_())
        return pa.table(cols)


class AudioFrameSampleStage:
    """binary audio → duration + per-frame RMS energy.

    PCM WAV payloads are decoded for REAL with the stdlib ``wave`` module
    (``decoder='wav'``): duration = frames / rate, and the signal is cut
    into ``n_frames`` equal segments whose RMS energies are emitted.
    Other formats (MP3/OGG — would need ffmpeg, unavailable) fall back to
    the deterministic fake (``decoder='fake'``), or raise under
    ``strict=True``."""

    def __init__(self, data_col: str = "data", n_frames: int = 4,
                 strict: bool = False) -> None:
        self.data_col = data_col
        self.n_frames = n_frames
        self.strict = strict

    def _energies(self, samples: np.ndarray) -> np.ndarray:
        segs = np.array_split(samples, self.n_frames)
        return np.array([np.sqrt(np.mean(np.square(s))) if len(s) else 0.0
                         for s in segs], dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from medcat_ray.ops.hashing import stable_u64
        frames, durations, decoders = [], [], []
        for data in batch[self.data_col].to_pylist():
            decoded = try_decode(decode_wav, data, self.strict)
            if decoded is not None:
                samples, rate = decoded
                durations.append(round(len(samples) / rate, 3))
                frames.append(self._energies(samples).tolist())
                decoders.append("wav")
                continue
            if self.strict:
                raise NotImplementedError(
                    "payload is not PCM WAV and ffmpeg/torchaudio are "
                    "unavailable; run with strict=False for the "
                    "deterministic fake sampler")
            h = stable_u64(data or b"")
            duration = 1.0 + (h % 300) / 10.0
            rng = np.random.default_rng(h & 0xFFFFFFFF)
            frames.append(rng.standard_normal(self.n_frames)
                          .astype(np.float32).tolist())
            durations.append(round(duration, 3))
            decoders.append("fake")
        cols = {name: batch[name] for name in batch.column_names
                if name != self.data_col}
        cols["duration_sec"] = pa.array(durations, type=pa.float32())
        cols["frame_energy"] = pa.array(frames, type=pa.list_(pa.float32()))
        cols["decoder"] = pa.array(decoders, type=pa.string())
        return pa.table(cols)


class VideoFrameSampleStage:
    """binary video → evenly-sampled frames' per-channel means + metadata.

    Uncompressed-DIB AVI payloads are decoded for REAL by
    :func:`decode_avi` (``decoder='avi'``): ``n_frames`` frames are picked
    at ``idx_i = ((2i + 1) * total) // (2 * n_frames)`` (integer midpoint —
    deterministic and SQL-recomputable) and each sampled frame contributes
    its per-channel pixel mean.  Compressed formats (would need ffmpeg,
    unavailable) fall back to the deterministic fake (``decoder='fake'``),
    or raise under ``strict=True``."""

    def __init__(self, data_col: str = "data", n_frames: int = 2,
                 strict: bool = False) -> None:
        self.data_col = data_col
        self.n_frames = n_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from medcat_ray.ops.hashing import stable_u64
        widths, heights, totals, fpss = [], [], [], []
        indices, means, decoders = [], [], []
        for data in batch[self.data_col].to_pylist():
            decoded = try_decode(decode_avi, data, self.strict)
            if decoded is not None:
                frames, fps = decoded
                total, h, w = frames.shape[:3]
                k = min(self.n_frames, total)
                idx = [((2 * i + 1) * total) // (2 * k) for i in range(k)]
                widths.append(w)
                heights.append(h)
                totals.append(total)
                fpss.append(fps)
                indices.append(idx)
                means.append([frames[j].reshape(-1, 3).mean(axis=0)
                              .astype(np.float32).tolist() for j in idx])
                decoders.append("avi")
                continue
            if self.strict:
                raise NotImplementedError(
                    "payload is not uncompressed-DIB AVI and ffmpeg is "
                    "unavailable; run with strict=False for the "
                    "deterministic fake sampler")
            hsh = stable_u64(data or b"")
            rng = np.random.default_rng(hsh & 0xFFFFFFFF)
            total = 2 + int(hsh % 30)
            k = min(self.n_frames, total)
            widths.append(16 + int(hsh & 0xFF))
            heights.append(16 + int((hsh >> 8) & 0xFF))
            totals.append(total)
            fpss.append(float(5 + hsh % 25))
            indices.append([((2 * i + 1) * total) // (2 * k)
                            for i in range(k)])
            means.append(rng.uniform(0, 255, size=(k, 3))
                         .astype(np.float32).tolist())
            decoders.append("fake")
        cols = {name: batch[name] for name in batch.column_names
                if name != self.data_col}
        cols["width"] = pa.array(widths, type=pa.int32())
        cols["height"] = pa.array(heights, type=pa.int32())
        cols["n_frames_total"] = pa.array(totals, type=pa.int32())
        cols["fps"] = pa.array(fpss, type=pa.float32())
        cols["frame_indices"] = pa.array(indices,
                                         type=pa.list_(pa.int32()))
        cols["frame_means"] = pa.array(
            means, type=pa.list_(pa.list_(pa.float32())))
        cols["decoder"] = pa.array(decoders, type=pa.string())
        return pa.table(cols)


def decode_images(ds: rd.Dataset, data_col: str = "data",
                  concurrency: int = 2, batch_size: int = 32,
                  strict: bool = False) -> rd.Dataset:
    """Actor-pool image decode; small batches — binary payloads are wide."""
    return ds.map_batches(ImageDecodeStage,
                          fn_constructor_kwargs=dict(data_col=data_col,
                                                     strict=strict),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def resize_images(ds: rd.Dataset, width: int, height: int,
                  data_col: str = "data", concurrency: int = 2,
                  batch_size: int = 32) -> rd.Dataset:
    """Actor-pool nearest-neighbor resize for builtin-decodable images."""
    return ds.map_batches(ImageResizeStage,
                          fn_constructor_kwargs=dict(width=width,
                                                     height=height,
                                                     data_col=data_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def sample_audio_frames(ds: rd.Dataset, data_col: str = "data",
                        concurrency: int = 2,
                        batch_size: int = 32) -> rd.Dataset:
    return ds.map_batches(AudioFrameSampleStage,
                          fn_constructor_kwargs=dict(data_col=data_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def sample_video_frames(ds: rd.Dataset, data_col: str = "data",
                        n_frames: int = 2, concurrency: int = 2,
                        batch_size: int = 16) -> rd.Dataset:
    """Actor-pool video frame sampling; video payloads are the widest of
    all — keep ``batch_size`` small."""
    return ds.map_batches(VideoFrameSampleStage,
                          fn_constructor_kwargs=dict(data_col=data_col,
                                                     n_frames=n_frames),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


# ---------------------------------------------------------------------------
# Perceptual hashing (aHash) + cross-modal near-dup
# ---------------------------------------------------------------------------


def ahash64(pixels: np.ndarray) -> int:
    """64-bit average hash of a decoded image, INTEGER-ONLY arithmetic
    (SQL-reproducible bit-for-bit):

    * gray = (r + g + b) // 3 per pixel (grayscale images used as-is);
    * 8×8 nearest-neighbor sample on the midpoint grid
      ``((2i + 1)·src) // 16`` per axis (integer twin of the resize
      stage's float midpoint rule — documented deviation);
    * bit (y·8 + x) = 1 iff sample > floor(mean of the 64 samples).
    """
    g = pixels.astype(np.int64)
    if g.ndim == 3:
        g = g.sum(axis=2) // g.shape[2]
    h, w = g.shape
    ys = ((2 * np.arange(8, dtype=np.int64) + 1) * h) // 16
    xs = ((2 * np.arange(8, dtype=np.int64) + 1) * w) // 16
    s = g[np.ix_(ys, xs)]
    m = int(s.sum()) // 64
    bits = (s.reshape(-1) > m).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


class ImageAHashStage:
    """Actor-pool stage: binary image → int64 ``ahash`` column (builtin
    netpbm/BMP decoders; non-decodable payloads raise under
    ``strict=True``, else are dropped from the hash stream)."""

    def __init__(self, data_col: str = "data", id_col: str = "doc_id",
                 strict: bool = False) -> None:
        self.data_col = data_col
        self.id_col = id_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for i, data in zip(batch[self.id_col].to_pylist(),
                           batch[self.data_col].to_pylist()):
            dec = try_decode(decode_netpbm, data, self.strict) \
                or try_decode(decode_bmp, data, self.strict)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        "payload is not netpbm/BMP; cannot ahash")
                continue
            ids.append(i)
            # bit-wrapped to int64 (bijective) like add_content_hash
            hashes.append(np.uint64(ahash64(dec[0])).view(np.int64)
                          .item())
        return pa.table({self.id_col: pa.array(
            ids, type=batch[self.id_col].type),
            "ahash": pa.array(hashes, type=pa.int64())})


def add_image_ahash(ds: rd.Dataset, data_col: str = "data",
                    id_col: str = "doc_id", strict: bool = False,
                    concurrency: int = 2,
                    batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(ImageAHashStage,
                          fn_constructor_kwargs=dict(
                              data_col=data_col, id_col=id_col,
                              strict=strict),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def image_near_dup_pairs(ds: rd.Dataset, data_col: str = "data",
                         id_col: str = "doc_id", strict: bool = False,
                         concurrency: int = 2,
                         method: str = "auto") -> rd.Dataset:
    """Image near-duplicate candidate pairs: perceptual aHash on an
    actor pool, then the signature-agnostic SimHash 3-of-6-block
    machinery (exact for Hamming ≤ 3, singleton buckets pruned
    natively) — the image-modality twin of text simhash dedup."""
    from medcat_ray.ops.dedup import simhash_candidates
    hashed = add_image_ahash(ds, data_col, id_col, strict, concurrency)
    return simhash_candidates(hashed, id_col=id_col, method=method,
                              sig_col="ahash")


# ---------------------------------------------------------------------------
# Audio fingerprinting: 64-bit energy-envelope hash over PCM WAV —
# the audio-modality twin of ahash64 (same floor-mean threshold rule,
# same signature-agnostic candidate machinery downstream).
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 mono samples as PCM WAV (the test/plant encoder
    complement of :func:`decode_wav`, like encode_ppm / encode_avi)."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.ascontiguousarray(
            samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav_int(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """Decode PCM WAV to INTEGER mono samples (int64) + rate — the
    integer-exact twin of :func:`decode_wav` for fingerprinting:
    16-bit stays raw int16, 8-bit is centered (-128), multi-channel
    collapses by floor-division mean, so every downstream value is
    SQL-reproducible bit-for-bit.  None for non-WAV payloads."""
    import io
    import wave
    if not data or data[:4] != b"RIFF":
        return None
    with wave.open(io.BytesIO(data)) as wf:
        n, width, nch = wf.getnframes(), wf.getsampwidth(), wf.getnchannels()
        raw = wf.readframes(n)
        rate = wf.getframerate()
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    elif width == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    if nch > 1:
        samples = samples.reshape(-1, nch).sum(axis=1) // nch
    return samples, rate


def audio_fp64(samples: np.ndarray) -> int:
    """64-bit energy-envelope fingerprint of integer PCM samples,
    INTEGER-ONLY arithmetic (SQL-reproducible bit-for-bit):

    * sample p of n belongs to segment ``(p * 64) // n`` (proportional
      binning — one closed-form rule for any length, no array_split
      remainder cases);
    * per-segment energy = floor-mean of \\|amplitude\\|
      (``sum(abs) // count``);
    * bit k = 1 iff segment k's energy > floor-mean of the 64 segment
      energies — the same midpoint rule as :func:`ahash64`, which makes
      the fingerprint invariant to silence padding at equal proportions
      and to global DC sign flips.
    """
    s = np.abs(samples.astype(np.int64))
    n = len(s)
    if n == 0:
        return 0
    idx = (np.arange(n, dtype=np.int64) * 64) // n
    sums = np.bincount(idx, weights=None, minlength=64).astype(np.int64)
    esum = np.bincount(idx, weights=s.astype(np.float64),
                       minlength=64).astype(np.int64)
    # bincount with float weights is exact for |values| < 2^53 per cell
    e = np.where(sums > 0, esum // np.maximum(sums, 1), 0)
    m = int(e.sum()) // 64
    bits = (e > m).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


class AudioFingerprintStage:
    """Actor-pool stage: binary audio → int64 ``afp`` column (stdlib
    WAV decode; non-WAV payloads raise under ``strict=True``, else are
    dropped from the fingerprint stream)."""

    def __init__(self, data_col: str = "data", id_col: str = "doc_id",
                 strict: bool = False) -> None:
        self.data_col = data_col
        self.id_col = id_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for i, data in zip(batch[self.id_col].to_pylist(),
                           batch[self.data_col].to_pylist()):
            dec = try_decode(decode_wav_int, data, self.strict)
            if dec is None:
                if self.strict:
                    raise NotImplementedError(
                        "payload is not PCM WAV; cannot fingerprint")
                continue
            ids.append(i)
            fps.append(np.uint64(audio_fp64(dec[0])).view(np.int64)
                       .item())
        return pa.table({self.id_col: pa.array(
            ids, type=batch[self.id_col].type),
            "afp": pa.array(fps, type=pa.int64())})


def add_audio_fingerprint(ds: rd.Dataset, data_col: str = "data",
                          id_col: str = "doc_id", strict: bool = False,
                          concurrency: int = 2,
                          batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(AudioFingerprintStage,
                          fn_constructor_kwargs=dict(
                              data_col=data_col, id_col=id_col,
                              strict=strict),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def audio_near_dup_pairs(ds: rd.Dataset, data_col: str = "data",
                         id_col: str = "doc_id", strict: bool = False,
                         concurrency: int = 2,
                         method: str = "auto") -> rd.Dataset:
    """Audio near-duplicate candidate pairs: energy-envelope fingerprint
    on an actor pool, then the signature-agnostic SimHash 3-of-6-block
    machinery (exact for Hamming ≤ 3, singleton buckets pruned
    natively) — the audio-modality twin of image_near_dup_pairs."""
    from medcat_ray.ops.dedup import simhash_candidates
    hashed = add_audio_fingerprint(ds, data_col, id_col, strict,
                                   concurrency)
    return simhash_candidates(hashed, id_col=id_col, method=method,
                              sig_col="afp")
