"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decoders are REAL for the pure-numpy formats (no external libraries):
- image: binary PPM (P6) — header parse + frombuffer, nearest-neighbor
  resize, channel means + downsampled grayscale features;
- audio: RIFF/WAV PCM16 — chunk walk to fmt/data, windowed RMS features;
- video: concatenated PPM frames (an MJPEG-like container of the only
  image format decodable without libraries) — frame delimiting from each
  header, first/middle/last frame sampling, per-frame image features.
Exotic formats (JPEG, opus, mp4) still raise ``NotImplementedError`` in
strict mode or flag ``decode_ok=false`` otherwise — swapping in PIL or
torchaudio later changes one decoder function, not the pipeline.

Layout rules that matter at 100 TB:
- media bytes ride in their own column so column pruning keeps metadata-only
  queries from touching them (ReadSchema shows the projection);
- batches are capped by bytes, not rows (one 4K image batch can blow the
  Arrow 2 GiB record-batch limit long before maxRecordsPerBatch trips).
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id string, kind string, payload binary, "
                "width int, height int, sample_rate int, n_frames int")

FEATURE_SCHEMA = ("media_id string, kind string, feat_dim int, "
                  "features array<float>, decode_ok boolean")

# media payload bytes per mapInPandas batch (keeps Arrow batches bounded)
DEFAULT_BATCH_BYTES = 64 << 20


# ---------------------------------------------------------------- PPM image

def _ppm_header(payload: bytes, pos: int = 0) -> tuple[int, int, int]:
    """Parse a P6 header starting at ``pos``: returns (width, height,
    data_offset). PPM allows '#' comments and arbitrary whitespace."""
    if payload[pos: pos + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = pos + 2
    n = len(payload)
    while len(fields) < 3:
        while i < n and payload[i: i + 1].isspace():
            i += 1
        if i < n and payload[i: i + 1] == b"#":  # comment to end of line
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j: j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[i:j]))
        i = j
    if fields[2] != 255:
        raise ValueError(f"unsupported PPM maxval {fields[2]}")
    return fields[0], fields[1], i + 1  # one whitespace after maxval


def decode_ppm(payload: bytes, pos: int = 0) -> tuple[np.ndarray, int]:
    """P6 PPM -> ((h, w, 3) uint8 array, end offset). Pure numpy."""
    w, h, off = _ppm_header(payload, pos)
    end = off + w * h * 3
    if end > len(payload):
        raise ValueError("truncated PPM pixel data")
    img = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                        offset=off).reshape(h, w, 3)
    return img, end


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> P6 bytes (fixture/synthesis helper)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index maps (the only resample that needs
    no interpolation arithmetic — deterministic across platforms)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def image_features(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """3 channel means + grid x grid downsampled grayscale, in [0, 1]."""
    means = img.reshape(-1, 3).mean(axis=0) / 255.0
    gray = img.astype(np.float32).mean(axis=2)
    small = resize_nearest(gray, grid, grid).ravel() / 255.0
    return np.concatenate([means, small]).astype(np.float32)


# ---------------------------------------------------------------- WAV audio

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (int16 samples [n, channels], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos: pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV format {audio_format}/{bits}bit")
    samples = np.frombuffer(data, dtype="<i2",
                            count=len(data) // 2).reshape(-1, channels)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 [n, channels] -> RIFF/WAVE PCM16 bytes (fixture helper)."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    channels = s.shape[1] if s.ndim == 2 else 1
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(samples: np.ndarray, windows: int = 8) -> np.ndarray:
    """Windowed RMS energy over the mono mix, normalized to [0, 1]."""
    mono = samples.astype(np.float64).mean(axis=1)
    n = (len(mono) // windows) * windows
    if n == 0:
        return np.zeros(windows, dtype=np.float32)
    chunks = mono[:n].reshape(windows, -1)
    rms = np.sqrt((chunks * chunks).mean(axis=1))
    return (rms / 32768.0).astype(np.float32)


# ------------------------------------------------------- video frame-sample

def iter_ppm_frames(payload: bytes):
    """Concatenated-PPM video: yield each frame (self-delimiting headers)."""
    pos = 0
    while pos < len(payload):
        img, pos = decode_ppm(payload, pos)
        yield img


def sample_frames(payload: bytes, n_sample: int = 3) -> list[np.ndarray]:
    """First/middle/last frame sampling without decoding pixels of skipped
    frames (header-walk delimits; slices are zero-copy views)."""
    frames = list(iter_ppm_frames(payload))
    if not frames:
        raise ValueError("empty video payload")
    if len(frames) <= n_sample:
        return frames
    idx = np.linspace(0, len(frames) - 1, n_sample).astype(int)
    return [frames[i] for i in idx]


def video_features(payload: bytes) -> np.ndarray:
    """Mean of image features over sampled frames + frame count."""
    frames = sample_frames(payload)
    feats = np.stack([image_features(f) for f in frames]).mean(axis=0)
    return np.concatenate([feats,
                           [np.float32(len(frames))]]).astype(np.float32)


# ------------------------------------------------------------- Spark plumbing

def synthesize_media(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads: P6 images, PCM16 WAV,
    concatenated-PPM video."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 8 + (i % 4) * 4, 8
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            payload, width, height, rate, nf = \
                encode_ppm(img), w, h, None, None
        elif kind == "audio":
            rate = 16000
            samples = rng.integers(-2048, 2048, (640, 1), dtype=np.int16)
            payload, width, height, nf = \
                encode_wav(samples, rate), None, None, None
        else:
            nf = 2 + i % 3
            frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                      for _ in range(nf)]
            payload = b"".join(encode_ppm(f) for f in frames)
            width, height, rate = 8, 8, None
        rows.append((f"media-{i:06d}", kind, bytearray(payload),
                     width, height, rate, nf))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthesize_media_parquet(path: str, n_rows: int = 96,
                             seed: int = 42) -> str:
    """Persist the deterministic media table WITH expected per-row features.

    The synthesizer constructs every payload, so it can also run the same
    pure-numpy feature extractors at build time and store the ground truth
    beside the payload (``expected_features``/``expected_feat_dim``). That
    turns the Spark-side decode into a fully checkable query: the driver
    compares decoded-vs-expected (exact float32 equality — both sides run
    identical numpy on identical bytes) and a SQL oracle only has to read
    the persisted truth, never parse PPM/WAV. Idempotent: an existing file
    is reused (same seed => same bytes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows: list[tuple] = []
    for i in range(n_rows):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 8 + (i % 4) * 4, 8
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            payload, width, height, rate, nf = \
                encode_ppm(img), w, h, None, None
        elif kind == "audio":
            rate = 16000
            samples = rng.integers(-2048, 2048, (640, 1), dtype=np.int16)
            payload, width, height, nf = \
                encode_wav(samples, rate), None, None, None
        else:
            nf = 2 + i % 3
            frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                      for _ in range(nf)]
            payload = b"".join(encode_ppm(f) for f in frames)
            width, height, rate = 8, 8, None
        exp = _decode_one(kind, payload, strict=True)
        rows.append((f"media-{i:06d}", kind, payload, width, height, rate,
                     nf, len(exp), exp.tolist()))
    cols = list(zip(*rows))
    schema = pa.schema([
        ("media_id", pa.string()), ("kind", pa.string()),
        ("payload", pa.binary()), ("width", pa.int32()),
        ("height", pa.int32()), ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()), ("expected_feat_dim", pa.int32()),
        ("expected_features", pa.list_(pa.float32())),
    ])
    tbl = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
        schema=schema)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".inprogress"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def _decode_one(kind: str, payload: bytes, strict: bool) -> np.ndarray:
    if kind == "image":
        img, _end = decode_ppm(payload)
        return image_features(img)
    if kind == "audio":
        samples, _rate = decode_wav(payload)
        return audio_features(samples)
    if kind == "video":
        return video_features(payload)
    raise ValueError(f"unknown media kind {kind!r}")


def extract_features(media: DataFrame, strict: bool = False,
                     batch_bytes: int = DEFAULT_BATCH_BYTES) -> DataFrame:
    """mapInPandas feature extraction over byte-capped sub-batches. Rows
    whose payload is not a decodable format yield decode_ok=false (or raise
    in strict mode) — the pipeline never silently fabricates features."""
    from ..shipping import ensure_shipped
    ensure_shipped(media.sparkSession)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # re-slice by payload bytes so one Arrow batch never carries more
            # than batch_bytes of media
            sizes = pdf["payload"].map(len).to_numpy()
            cuts = [0]
            acc = 0
            for i, s in enumerate(sizes):
                acc += int(s)
                if acc >= batch_bytes:
                    cuts.append(i + 1)
                    acc = 0
            if cuts[-1] != len(pdf):
                cuts.append(len(pdf))
            for lo, hi in zip(cuts[:-1], cuts[1:]):
                sub = pdf.iloc[lo:hi]
                m = len(sub)
                kinds = sub["kind"].to_numpy()
                payloads = sub["payload"].to_numpy()
                feats: list = [None] * m
                ok = np.zeros(m, dtype=bool)
                # dispatch once per kind, decode over the kind's slice
                for kind in np.unique(kinds):
                    idx = np.flatnonzero(kinds == kind)
                    for i in idx.tolist():
                        try:
                            f = _decode_one(str(kind), bytes(payloads[i]),
                                            strict)
                            feats[i] = f.tolist()
                            ok[i] = True
                        except (ValueError, struct.error):
                            if strict:
                                raise
                yield pd.DataFrame({
                    "media_id": sub["media_id"],
                    "kind": sub["kind"],
                    "feat_dim": [len(f) if f else 0 for f in feats],
                    "features": feats,
                    "decode_ok": ok,
                })

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — does NOT touch the payload column, so a
    parquet-backed source only scans the metadata columns (check
    .explain ReadSchema for the pruned projection)."""
    return (media.groupBy("kind")
            .agg(F.count("*").alias("n"),
                 F.max("width").alias("max_width"),
                 F.max("sample_rate").alias("max_sample_rate")))
