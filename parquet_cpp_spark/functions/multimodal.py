"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition sizing, Arrow batch shapes,
mapInPandas signatures) is real and tested; the actual media decoding is
STUBBED behind ``_decode_image``/``_decode_audio`` — this container ships no
image/audio libraries, so the stubs either raise ``NotImplementedError``
(strict mode) or produce a deterministic fake (test mode). Swapping in
PIL/torchaudio later changes one function, not the pipeline.

Layout rules that matter at 100 TB:
- media bytes ride in their own column so column pruning keeps metadata-only
  queries from touching them (ReadSchema shows the projection);
- batches are capped by bytes, not rows (one 4K image batch can blow the
  Arrow 2 GiB record-batch limit long before maxRecordsPerBatch trips).
"""

from __future__ import annotations

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


def synthesize_media(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, 256 + (i % 5) * 128,
                               dtype=np.uint8).tobytes()
        rows.append((f"media-{i:06d}", kind, bytearray(payload),
                     64 if kind != "audio" else None,
                     64 if kind != "audio" else None,
                     16000 if kind == "audio" else None,
                     30 if kind == "video" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image(payload: bytes, width, height, strict: bool) -> np.ndarray:
    """STUB: real impl would be PIL.Image.open(BytesIO(payload)) -> resize.
    Deterministic fake: payload bytes folded into an 8-dim histogram."""
    if strict:
        raise NotImplementedError("image decode requires an imaging library "
                                  "not present in this container")
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 5, minlength=8).astype(np.float32)
    return hist / max(1.0, float(hist.sum()))


def _decode_audio(payload: bytes, sample_rate, strict: bool) -> np.ndarray:
    """STUB: real impl would decode PCM/opus and compute e.g. mel energies."""
    if strict:
        raise NotImplementedError("audio decode requires an audio library "
                                  "not present in this container")
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    n = (len(arr) // 8) * 8
    return arr[:n].reshape(-1, 8).mean(axis=0) / 255.0


def extract_features(media: DataFrame, strict: bool = False,
                     batch_bytes: int = DEFAULT_BATCH_BYTES) -> DataFrame:
    """mapInPandas feature extraction over byte-capped sub-batches."""

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
                widths = sub["width"].to_numpy()
                heights = sub["height"].to_numpy()
                rates = sub["sample_rate"].to_numpy()
                feats: list = [None] * m
                ok = np.zeros(m, dtype=bool)
                # dispatch once per kind, decode over the kind's slice
                # (a real imaging/audio lib batches per modality the same
                # way; no per-row pandas objects)
                for kind in np.unique(kinds):
                    idx = np.flatnonzero(kinds == kind)
                    for i in idx.tolist():
                        try:
                            if kind == "audio":
                                f = _decode_audio(bytes(payloads[i]),
                                                  rates[i], strict)
                            else:  # image; video frame-sample = image stub
                                f = _decode_image(bytes(payloads[i]),
                                                  widths[i], heights[i],
                                                  strict)
                            feats[i] = f.tolist()
                            ok[i] = True
                        except NotImplementedError:
                            pass
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
