"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.  The actual codec libraries (Pillow/OpenCV/ffmpeg)
are NOT in this container, so the decode step is STUBBED:

- ``DecodeImage`` tries ``PIL``; absent → a clearly-marked deterministic
  fake decoder (seeded from the payload hash) with the REAL schema, batch
  sizing, actor signature and output layout;
- everything downstream (resize, feature extraction, frame sampling) is
  real NumPy and runs identically once a real decoder is swapped in.

Schema: media rows are (media_id:string, kind:string, payload:binary,
width:int32, height:int32, n_frames:int32, sample_rate:int32).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

try:  # pragma: no cover — not available in this container
    from PIL import Image
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
    ("sample_rate", pa.int32()),
])


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """STUB decoder (no image libs in this environment): deterministic RGB
    array seeded by the payload hash — replace with PIL/cv2 in production."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


class DecodeImage:
    """Actor-pool stage: payload → decoded RGB ndarray flattened into a
    binary column + shape columns.  Small batch_size — decoded frames are
    ~h*w*3 bytes each; size batches so batch × concurrency fits the heap."""

    def __init__(self, target: tuple[int, int] | None = None):
        self.target = target

    def __call__(self, b: pa.Table) -> pa.Table:
        out_pix, out_h, out_w = [], [], []
        payloads = b["payload"].to_pylist()
        hs = b["height"].to_pylist()
        ws = b["width"].to_pylist()
        for i in range(b.num_rows):
            if HAVE_PIL:  # pragma: no cover
                import io
                arr = np.asarray(Image.open(io.BytesIO(payloads[i])).convert("RGB"))
            else:
                arr = _fake_decode(payloads[i], int(hs[i]), int(ws[i]))
            if self.target is not None:
                arr = resize_nearest(arr, self.target)
            out_pix.append(arr.tobytes())
            out_h.append(arr.shape[0])
            out_w.append(arr.shape[1])
        return pa.table({
            "media_id": b["media_id"],
            "kind": b["kind"],
            "pixels": pa.array(out_pix, pa.binary()),
            "height": pa.array(out_h, pa.int32()),
            "width": pa.array(out_w, pa.int32()),
        })


def resize_nearest(arr: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy; PIL-free)."""
    th, tw = target
    h, w = arr.shape[:2]
    yi = (np.arange(th) * h // th).clip(0, h - 1)
    xi = (np.arange(tw) * w // tw).clip(0, w - 1)
    return arr[yi][:, xi]


class ImageFeatures:
    """Actor-pool stage: decoded image → feature row (mean RGB, luma
    histogram, edge energy) — real numpy compute on the (possibly stubbed)
    decoded pixels."""

    def __call__(self, b: pa.Table) -> pd.DataFrame:
        recs = []
        pix = b["pixels"].to_pylist()
        hs = b["height"].to_pylist()
        ws = b["width"].to_pylist()
        mids = b["media_id"].to_pylist()
        for i in range(b.num_rows):
            arr = np.frombuffer(pix[i], np.uint8).reshape(int(hs[i]), int(ws[i]), 3)
            luma = arr.astype(np.float64) @ [0.299, 0.587, 0.114]
            gx = np.abs(np.diff(luma, axis=1)).mean()
            gy = np.abs(np.diff(luma, axis=0)).mean()
            recs.append((mids[i], *[round(float(arr[..., c].mean()), 4) for c in range(3)],
                         round(float(luma.std()), 4), round(float(gx + gy), 4)))
        return pd.DataFrame(recs, columns=["media_id", "mean_r", "mean_g", "mean_b",
                                           "luma_std", "edge_energy"])


def sample_frames(n_frames: int, every: int) -> np.ndarray:
    """Frame-sampling plan for video rows (indices, deterministic)."""
    return np.arange(0, n_frames, every, dtype=np.int64)


def decode_and_featurize(media: rd.Dataset, target: tuple[int, int] | None = None,
                         concurrency: int = 4, batch_size: int = 64) -> rd.Dataset:
    decoded = media.map_batches(DecodeImage, fn_constructor_kwargs={"target": target},
                                batch_format="pyarrow", batch_size=batch_size,
                                concurrency=concurrency)
    return decoded.map_batches(ImageFeatures, batch_format="pyarrow",
                               batch_size=batch_size, concurrency=concurrency)


def synth_media(n: int = 256, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        rows["media_id"].append(f"m{i:06d}")
        rows["kind"].append(kind)
        rows["payload"].append(rng.bytes(128))
        rows["width"].append(int(rng.integers(32, 128)))
        rows["height"].append(int(rng.integers(32, 128)))
        rows["n_frames"].append(int(rng.integers(1, 300)) if kind == "video" else 1)
        rows["sample_rate"].append(16000 if kind == "audio" else 0)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def _fake_decode_audio(payload: bytes, n_samples: int = 4096) -> np.ndarray:
    """STUB audio decoder (no codec libs in this environment): deterministic
    f4 waveform seeded by the payload hash — replace with soundfile/ffmpeg
    in production."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "big")
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float32)
    f0 = float(rng.uniform(0.002, 0.05))
    return (np.sin(2 * np.pi * f0 * t) * 0.5
            + rng.normal(0, 0.1, n_samples)).astype(np.float32)


class AudioFeatures:
    """Actor-pool stage: audio payload → decoded waveform (stub) → real
    NumPy features (RMS, zero-crossing rate, dominant FFT bin, spectral
    centroid) — the audio twin of ImageFeatures; swap the decoder for a
    real codec and everything downstream is unchanged."""

    def __call__(self, b: pa.Table) -> pd.DataFrame:
        recs = []
        payloads = b["payload"].to_pylist()
        mids = b["media_id"].to_pylist()
        srs = b["sample_rate"].to_pylist()
        for i in range(b.num_rows):
            w = _fake_decode_audio(payloads[i])
            rms = float(np.sqrt(np.mean(w**2)))
            zcr = float((np.diff(np.signbit(w)) != 0).mean())
            spec = np.abs(np.fft.rfft(w.astype(np.float64)))
            dom_bin = int(spec[1:].argmax()) + 1
            centroid = float((spec * np.arange(spec.size)).sum() / spec.sum())
            recs.append((mids[i], int(srs[i]), round(rms, 6), round(zcr, 6),
                         dom_bin, round(centroid, 4)))
        return pd.DataFrame(recs, columns=["media_id", "sample_rate", "rms",
                                           "zcr", "dom_bin", "centroid"])
