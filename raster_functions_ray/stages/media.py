"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.  Decode is REAL for the self-describing
uncompressed container formats — they are header + raw array, so pure
numpy decodes them with no codec library:

- BMP (24bpp BITMAPINFOHEADER: bottom-up scanlines, BGR order, rows
  padded to 4 bytes) via ``decode_bmp`` / ``encode_bmp``;
- WAV (RIFF PCM16: chunk walk for fmt/data) via ``decode_wav`` /
  ``encode_wav``;
- y4m / YUV4MPEG2 (C444: plain-text stream header + FRAME markers + raw
  planes) via ``decode_y4m`` / ``encode_y4m`` — real video decode +
  frame sampling, no ffmpeg.

Compressed formats (PNG/JPEG/MP3/H.264) dispatch to PIL/ffmpeg behind an
import-try; those wheels are NOT in this container, so unknown payloads
fall back to a clearly-marked deterministic stub (video: refuse).

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
    """STUB decoder for formats with no available codec: deterministic RGB
    array seeded by the payload hash — replace with PIL/cv2 in production."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


# --------------------------------------------- pure-numpy container codecs

def encode_bmp(arr: np.ndarray) -> bytes:
    """24bpp uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER): RGB
    (h, w, 3) uint8 in → standard file bytes out.  Scanlines bottom-up,
    BGR channel order, each row zero-padded to a 4-byte boundary."""
    import struct
    h, w, _ = arr.shape
    row_len = (w * 3 + 3) & ~3
    img_size = row_len * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24bpp uncompressed BMP into RGB (h, w, 3) uint8 — pure
    numpy, no codec library."""
    import struct
    magic, _, _, _, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_sz, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=row_len * h,
                         offset=off).reshape(h, row_len)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if bottom_up else img


def encode_wav(wave: np.ndarray, sample_rate: int) -> bytes:
    """PCM16 mono RIFF/WAVE: float32 waveform in [-1, 1] in → standard
    file bytes out."""
    import struct
    pcm = np.clip(np.round(np.asarray(wave, np.float64) * 32767.0),
                  -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 RIFF/WAVE payload (chunk walk, mono or first
    channel) into (float32 waveform in [-1, 1], sample_rate)."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sr, channels, data = 12, None, 1, None
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt_tag, channels, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt_tag}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    pcm = np.frombuffer(data, "<i2")
    if channels > 1:
        pcm = pcm[::channels]
    return (pcm.astype(np.float32) / 32768.0), int(sr)


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
            if payloads[i][:2] == b"BM":
                arr = decode_bmp(payloads[i])  # real decode, pure numpy
            elif HAVE_PIL:  # pragma: no cover
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
    """Deterministic media table for tests/benches.  Image and audio rows
    carry REAL container payloads (24bpp BMP / PCM16 WAV) so the decode
    stages exercise genuine format parsing; video payloads stay opaque
    (no codec-free standard container) — the frame plan is the real part."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        rows["media_id"].append(f"m{i:06d}")
        rows["kind"].append(kind)
        w = int(rng.integers(32, 128))
        h = int(rng.integers(32, 128))
        nf = 1
        if kind == "image":
            yy, xx = np.mgrid[0:h, 0:w]
            arr = np.stack([(xx * 255 // max(w - 1, 1)),
                            (yy * 255 // max(h - 1, 1)),
                            rng.integers(0, 256, (h, w))], axis=-1).astype(np.uint8)
            rows["payload"].append(encode_bmp(arr))
        elif kind == "audio":
            ns = 2048 + 1024 * int(rng.integers(0, 4))
            t = np.arange(ns, dtype=np.float64)
            f0 = float(rng.uniform(0.002, 0.05))
            wav = np.sin(2 * np.pi * f0 * t) * 0.5 + rng.normal(0, 0.1, ns)
            rows["payload"].append(encode_wav(np.clip(wav, -1, 1), 16000))
        else:
            # real y4m clip: a moving diagonal gradient, small frames so
            # payload stays a few hundred KB across the table
            nf = int(rng.integers(4, 25))
            w, h = 32, 24
            yy, xx = np.mgrid[0:h, 0:w]
            fr = np.stack([((xx + yy + 7 * f) % 256) for f in range(nf)])
            frames = np.stack([fr, np.full_like(fr, 128),
                               np.full_like(fr, 128)], axis=-1).astype(np.uint8)
            rows["payload"].append(encode_y4m(frames, fps=25))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(nf)
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
        import struct
        for i in range(b.num_rows):
            w = None
            if payloads[i][:4] == b"RIFF" and payloads[i][8:12] == b"WAVE":
                try:
                    w, _ = decode_wav(payloads[i])  # real decode, pure numpy
                except (ValueError, struct.error):
                    w = None  # non-PCM16 / truncated: fall through to stub
            if w is None:
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


# ------------------------------------------- y4m video container codec

def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """YUV4MPEG2 (y4m) uncompressed video: (n, h, w, 3) uint8 YUV444
    frames in → standard stream bytes out (plain-text stream header +
    FRAME markers + raw planes; what ffmpeg/mplayer call y4m)."""
    n, h, w, _ = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode()
    parts = [head]
    for i in range(n):
        # planar: full Y plane, then U, then V
        parts.append(b"FRAME\n")
        parts.append(frames[i].transpose(2, 0, 1).tobytes())
    return b"".join(parts)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a C444 y4m stream into ((n, h, w, 3) uint8 YUV frames, fps)
    — pure numpy, no codec library."""
    nl = payload.index(b"\n")
    head = payload[:nl].decode("ascii", "strict")
    if not head.startswith("YUV4MPEG2"):
        raise ValueError("not a y4m payload")
    w = h = fps = None
    for tok in head.split(" ")[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("F"):
            fps = int(tok[1:].split(":")[0])
        elif tok.startswith("C") and tok not in ("C444",):
            raise ValueError(f"unsupported y4m chroma {tok}")
    if not (w and h):
        raise ValueError("y4m header missing W/H")
    frame_bytes = 3 * h * w
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("y4m stream corrupt (missing FRAME marker)")
        pos = fnl + 1
        planes = np.frombuffer(payload, np.uint8, count=frame_bytes,
                               offset=pos).reshape(3, h, w)
        frames.append(planes.transpose(1, 2, 0))
        pos += frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8), \
        int(fps or 25)


class VideoFrameFeatures:
    """Actor-pool stage: y4m video payload → REAL container decode →
    frame-sampling plan (sample_frames) → per-sampled-frame luma stats
    reduced to one feature row per video.  Non-y4m payloads refuse with a
    clear error (compressed video needs ffmpeg, absent here)."""

    def __init__(self, every: int = 4):
        self.every = every

    def __call__(self, b: pa.Table) -> pd.DataFrame:
        recs = []
        payloads = b["payload"].to_pylist()
        mids = b["media_id"].to_pylist()
        for i in range(b.num_rows):
            frames, fps = decode_y4m(payloads[i])
            take = sample_frames(frames.shape[0], self.every)
            luma = frames[take, :, :, 0].astype(np.float64)
            recs.append((mids[i], int(frames.shape[0]), int(take.size), fps,
                         round(float(luma.mean()), 4),
                         round(float(luma.std()), 4),
                         round(float(np.abs(np.diff(
                             luma.mean(axis=(1, 2)))).mean())
                             if take.size > 1 else 0.0, 4)))
        return pd.DataFrame(recs, columns=[
            "media_id", "n_frames", "n_sampled", "fps",
            "luma_mean", "luma_std", "motion"])
