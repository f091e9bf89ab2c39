"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` payload columns plus a typed metadata
struct; all heavy per-item work (decode, feature-extract, resize,
frame-sample) runs as Arrow-batched ``mapInPandas`` stages so Python
touches whole columnar batches, never row-at-a-time.

Codec libraries (PIL / libav / soundfile) are NOT in this container,
so the decode step is pluggable: ``real_decoder(kind)`` raises
``NotImplementedError`` with the dependency named, and
``fake_decoder`` derives a small deterministic tensor from the payload
bytes — the Spark-side plumbing (schema, batch shape, UDF signature,
fan-out) is real and fully tested against the fake.

Scale notes (100 TB of media):
- payloads dominate row size → cap Arrow batches via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set by callers to
  ~64 for multi-MB payloads) so a batch fits executor memory;
- feature extraction is embarrassingly parallel: no shuffle at all —
  the scan partitions by file split and every stage is a map;
- frame sampling fans out 1→N rows inside the same task (a generator
  per batch), so no explode-shuffle either;
- column pruning still applies: stages select only (id, payload, meta),
  so parquet never reads payloads for metadata-only queries.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, codec:string>"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, mean_intensity double, intensity_std double"
)
AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, rms double, peak double"
)
FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms long, payload binary"
RESIZE_SCHEMA = MEDIA_SCHEMA

Decoder = Callable[[bytes, dict], np.ndarray]


def real_decoder(kind: str) -> Decoder:
    """The production decode path. Raises until the codec libraries are
    installed on the cluster image — STUB, clearly marked."""

    def decode(payload: bytes, meta: dict) -> np.ndarray:
        raise NotImplementedError(
            f"{kind} decode requires a codec library (PIL/libav/soundfile) "
            "not present in this container; plug a Decoder into the "
            "operator or use fake_decoder for plumbing tests"
        )

    return decode


def fake_decoder(kind: str) -> Decoder:
    """Deterministic stand-in: a tensor seeded from the payload bytes.
    Same payload -> same tensor in every engine and test run."""

    def decode(payload: bytes, meta: dict) -> np.ndarray:
        seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
        rs = np.random.RandomState(seed)
        if kind == "image":
            w = int(meta.get("width") or 8)
            h = int(meta.get("height") or 8)
            return rs.randint(0, 256, (h, w), dtype=np.uint8)
        n = max(int(meta.get("sample_rate") or 8000) * int(meta.get("duration_ms") or 100) // 1000, 1)
        return (rs.rand(min(n, 65536)) * 2.0 - 1.0).astype(np.float32)

    return decode


def _meta_dict(meta) -> dict:
    if meta is None:
        return {}
    return meta if isinstance(meta, dict) else meta._asdict() if hasattr(meta, "_asdict") else dict(meta)


def extract_image_features(media: DataFrame, decoder: Decoder | None = None) -> DataFrame:
    """Per-image decode + summary stats. One map stage, no shuffle."""
    dec = decoder or real_decoder("image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                img = dec(bytes(payload), _meta_dict(meta))
                out.append(
                    {
                        "media_id": mid,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "mean_intensity": round(float(img.mean()), 4),
                        "intensity_std": round(float(img.std()), 4),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "mean_intensity", "intensity_std"])

    return media.filter(media.kind == "image").select("media_id", "payload", "meta").mapInPandas(
        run, IMAGE_FEATURE_SCHEMA
    )


def extract_audio_features(media: DataFrame, decoder: Decoder | None = None) -> DataFrame:
    """Per-clip decode + waveform stats (RMS / peak)."""
    dec = decoder or real_decoder("audio")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                m = _meta_dict(meta)
                wave = dec(bytes(payload), m)
                out.append(
                    {
                        "media_id": mid,
                        "sample_rate": int(m.get("sample_rate") or 0),
                        "n_samples": len(wave),
                        "rms": round(float(np.sqrt(np.mean(wave.astype("float64") ** 2))), 6),
                        "peak": round(float(np.abs(wave).max()), 6),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "sample_rate", "n_samples", "rms", "peak"])

    return media.filter(media.kind == "audio").select("media_id", "payload", "meta").mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )


def resize_images(
    media: DataFrame, width: int, height: int, decoder: Decoder | None = None
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (raw bytes here;
    the real path would re-encode via the codec). Output keeps
    MEDIA_SCHEMA so resize stages compose."""
    dec = decoder or real_decoder("image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                img = dec(bytes(payload), _meta_dict(meta))
                ys = (np.arange(height) * img.shape[0] // height).clip(0, img.shape[0] - 1)
                xs = (np.arange(width) * img.shape[1] // width).clip(0, img.shape[1] - 1)
                resized = img[np.ix_(ys, xs)]
                out.append(
                    {
                        "media_id": mid,
                        "kind": "image",
                        "payload": resized.tobytes(),
                        "meta": {
                            "width": width,
                            "height": height,
                            "sample_rate": None,
                            "duration_ms": None,
                            "codec": "raw",
                        },
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload", "meta"])

    return media.filter(media.kind == "image").select("media_id", "payload", "meta").mapInPandas(
        run, RESIZE_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame rows: 1→N fan-out INSIDE the map task (generator
    per batch), so frame explosion never shuffles. Frame payloads are
    deterministic slices of the source payload (real path: codec
    keyframe extraction — stubbed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                m = _meta_dict(meta)
                dur = int(m.get("duration_ms") or 0)
                raw = bytes(payload)
                n = max(dur // every_ms, 1)
                for i in range(n):
                    lo = (i * len(raw)) // n
                    hi = ((i + 1) * len(raw)) // n
                    out.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "payload": raw[lo:hi],
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "ts_ms", "payload"])

    return media.filter(media.kind == "video").select("media_id", "payload", "meta").mapInPandas(
        run, FRAME_SCHEMA
    )


def synth_media(spark, n: int = 12, seed: int = 7):
    """Deterministic media fixture: n rows cycling image/audio/video
    with hash-derived payload bytes."""
    import hashlib

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        meta = {
            "width": 8 + (i % 4) * 4 if kind == "image" else None,
            "height": 8 + (i % 3) * 4 if kind == "image" else None,
            "sample_rate": 8000 if kind == "audio" else None,
            "duration_ms": 100 + 50 * i if kind in ("audio", "video") else None,
            "codec": {"image": "png", "audio": "pcm", "video": "h264"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
