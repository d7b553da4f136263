"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are STUBBED: each stage tries the real import in
``__init__`` and otherwise uses a clearly-marked deterministic fake (or
raises ``NotImplementedError`` in ``strict`` mode).  The Ray-side plumbing —
schema, batch sizing for large binary payloads, actor signature, output
layout — is real and tested.

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

IMAGE_META_TYPE = pa.struct([
    ("width", pa.int32()), ("height", pa.int32()),
    ("mode", pa.string()), ("decoder", pa.string()),
])


class ImageDecodeStage:
    """binary image → (width, height, mode) metadata + feature vector.

    Real path: PIL (absent here).  Fake path: deterministic pseudo-decode
    from the byte content (stable hash → dims), marked ``decoder='fake'``.
    """

    def __init__(self, data_col: str = "data", strict: bool = False,
                 feature_dim: int = 8) -> None:
        self.data_col = data_col
        self.feature_dim = feature_dim
        try:
            from PIL import Image  # noqa: F401  (not in this container)
            self._pil = Image
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "Image decoding requires PIL, which is not available in "
                    "this environment; run with strict=False for the "
                    "deterministic fake decoder.")
            self._pil = None

    def _fake_decode(self, data: bytes) -> Tuple[int, int, str, np.ndarray]:
        from medcat_ray.ops.hashing import stable_u64
        h = stable_u64(data or b"")
        width = 16 + (h & 0xFF)
        height = 16 + ((h >> 8) & 0xFF)
        rng = np.random.default_rng(h & 0xFFFFFFFF)
        feat = rng.standard_normal(self.feature_dim).astype(np.float32)
        return width, height, "RGB", feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats = [], []
        for data in batch[self.data_col].to_pylist():
            if self._pil is not None:
                import io
                img = self._pil.open(io.BytesIO(data))
                arr = np.asarray(img, dtype=np.float32)
                feat = arr.mean(axis=(0, 1)).astype(np.float32)
                feat = np.resize(feat, self.feature_dim)
                metas.append({"width": img.width, "height": img.height,
                              "mode": img.mode, "decoder": "pil"})
            else:
                w, h, mode, feat = self._fake_decode(data)
                metas.append({"width": w, "height": h, "mode": mode,
                              "decoder": "fake"})
            feats.append(feat.tolist())
        cols = {name: batch[name] for name in batch.column_names
                if name != self.data_col}  # drop binary payload early
        cols["image_meta"] = pa.array(metas, type=IMAGE_META_TYPE)
        cols["features"] = pa.array(feats, type=pa.list_(pa.float32()))
        return pa.table(cols)


class AudioFrameSampleStage:
    """binary audio → fixed-rate frame sample summary (stubbed decode)."""

    def __init__(self, data_col: str = "data", n_frames: int = 4,
                 strict: bool = False) -> None:
        self.data_col = data_col
        self.n_frames = n_frames
        if strict:
            raise NotImplementedError(
                "Audio decoding requires ffmpeg/torchaudio (unavailable); "
                "strict=False uses the deterministic fake sampler.")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from medcat_ray.ops.hashing import stable_u64
        frames = []
        durations = []
        for data in batch[self.data_col].to_pylist():
            h = stable_u64(data or b"")
            duration = 1.0 + (h % 300) / 10.0
            rng = np.random.default_rng(h & 0xFFFFFFFF)
            frames.append(rng.standard_normal(self.n_frames)
                          .astype(np.float32).tolist())
            durations.append(round(duration, 3))
        cols = {name: batch[name] for name in batch.column_names
                if name != self.data_col}
        cols["duration_sec"] = pa.array(durations, type=pa.float32())
        cols["frame_energy"] = pa.array(frames, type=pa.list_(pa.float32()))
        return pa.table(cols)


def decode_images(ds: rd.Dataset, data_col: str = "data",
                  concurrency: int = 2, batch_size: int = 32) -> rd.Dataset:
    """Actor-pool image decode; small batches — binary payloads are wide."""
    return ds.map_batches(ImageDecodeStage,
                          fn_constructor_kwargs=dict(data_col=data_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def sample_audio_frames(ds: rd.Dataset, data_col: str = "data",
                        concurrency: int = 2,
                        batch_size: int = 32) -> rd.Dataset:
    return ds.map_batches(AudioFrameSampleStage,
                          fn_constructor_kwargs=dict(data_col=data_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
