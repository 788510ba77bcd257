"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct
(modality, format, width/height/duration). The Spark-side machinery —
schema, partition-aware batching, Arrow UDF signatures, output shapes —
is real and tested.

Codecs come in two tiers:

- REAL decoders for self-describing formats that need no external
  library: WAV/PCM audio (stdlib ``wave`` + numpy: sample rate,
  duration, RMS, frame-sampled energy bins) and PPM/P6 images (pure
  numpy: dimensions, channel means, mean-pooled grid "resize").
- STUB for container formats whose codecs aren't in this environment
  (jpeg/mp3/mp4): explicit NotImplementedError unless ``fake=True``,
  which substitutes a deterministic byte-fold so pipelines exercise
  the full Arrow path end-to-end.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("fmt", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("payload_bytes", T.IntegerType()),
    ]
)


def synthetic_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("modality"),
        F.lit("raw").alias("fmt"),
        F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 256).cast("binary").alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1080)) + 1).cast("int").alias("height"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    return df


# --------------------------------------------------------- real codecs

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """PCM16 mono WAV bytes from float samples in [-1, 1] (stdlib only)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes, feature_dim: int) -> tuple[np.ndarray, dict]:
    """Real WAV decode: header parse + PCM16 → float, then a fixed-size
    feature: [sample_rate_khz, duration_s, rms, peak] + frame-sampled
    per-bin RMS energies padded to ``feature_dim``."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        sr, n, width = w.getframerate(), w.getnframes(), w.getsampwidth()
        raw = w.readframes(n)
    if width != 2:
        raise ValueError(f"only PCM16 supported, got sampwidth={width}")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
    dur = n / float(sr) if sr else 0.0
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    peak = float(np.max(np.abs(x))) if len(x) else 0.0
    head = [sr / 1000.0, dur, rms, peak]
    n_bins = max(feature_dim - len(head), 0)
    bins = []
    if n_bins and len(x):
        # frame-sample: split into n_bins equal frames, RMS per frame
        edges = np.linspace(0, len(x), n_bins + 1, dtype=int)
        bins = [
            float(np.sqrt(np.mean(x[a:b] ** 2))) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
    feat = np.asarray((head + bins)[:feature_dim], dtype=np.float32)
    if len(feat) < feature_dim:
        feat = np.pad(feat, (0, feature_dim - len(feat)))
    return feat, {"sample_rate": sr, "n_frames": n}


def encode_ppm(img: np.ndarray) -> bytes:
    """P6 (binary) PPM bytes from an (H, W, 3) uint8 array."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes, feature_dim: int) -> tuple[np.ndarray, dict]:
    """Real PPM/P6 decode (pure numpy): dims + per-channel means + a
    mean-pooled grid (the 'resize' step) padded to ``feature_dim``."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    w, h = (int(v) for v in parts[1].split())
    img = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
    means = img.reshape(-1, 3).mean(axis=0) / 255.0
    head = [w / 1000.0, h / 1000.0, *means.tolist()]
    n_cells = max(feature_dim - len(head), 0)
    cells = []
    if n_cells:
        g = int(np.ceil(np.sqrt(n_cells)))
        gray = img.mean(axis=2)
        ys = np.linspace(0, h, g + 1, dtype=int)
        xs = np.linspace(0, w, g + 1, dtype=int)
        for i in range(g):
            for j in range(g):
                if len(cells) >= n_cells:
                    break
                patch = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                             xs[j]:max(xs[j + 1], xs[j] + 1)]
                cells.append(float(patch.mean()) / 255.0)
    feat = np.asarray((head + cells)[:feature_dim], dtype=np.float32)
    if len(feat) < feature_dim:
        feat = np.pad(feat, (0, feature_dim - len(feat)))
    return feat, {"width": w, "height": h}


_REAL_DECODERS = {"wav": decode_wav, "ppm": decode_ppm}


def decode_batch(batch: pd.DataFrame, feature_dim: int, fake: bool) -> pd.DataFrame:
    """Decode one Arrow batch of media rows into feature vectors.

    ``fmt`` in {wav, ppm} decodes for REAL (stdlib/numpy). Container
    formats (jpeg/mp3/mp4) need codecs not present in this environment:
    explicit NotImplementedError, or the deterministic byte-fold stub
    under ``fake=True`` so batching/schema/shape still get exercised.
    """
    feats = []
    fmts = batch["fmt"] if "fmt" in batch else pd.Series(["raw"] * len(batch))
    for payload, fmt in zip(batch["payload"], fmts):
        dec = _REAL_DECODERS.get((fmt or "").lower())
        if dec is not None:
            feats.append(dec(bytes(payload), feature_dim)[0])
        elif fake:
            raw = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float32)
            reps = int(np.ceil(feature_dim / max(len(raw), 1)))
            feats.append(np.resize(np.tile(raw, reps), feature_dim) / 255.0)
        else:
            raise NotImplementedError(
                f"no codec for fmt={fmt!r} in this environment (jpeg/mp3/mp4 "
                "need external libs); wav/ppm decode natively, or pass "
                "fake=True for the deterministic stub"
            )
    return pd.DataFrame(
        {
            "media_id": batch["media_id"],
            "modality": batch["modality"],
            "feature": [f.tolist() for f in feats],
            "payload_bytes": [len(p or b"") for p in batch["payload"]],
        }
    )


def extract_features(
    media: DataFrame, feature_dim: int = 16, fake: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    Column pruning matters at scale: only the columns the kernel needs
    are selected before the Python boundary, so Arrow ships payload +
    ids, not the whole row.
    """
    cols = ["media_id", "modality", "payload"] + (["fmt"] if "fmt" in media.columns else [])
    pruned = media.select(*cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield decode_batch(b, feature_dim, fake)

    return pruned.mapInPandas(gen, FEATURE_SCHEMA)


def synthetic_codec_media_df(spark, n: int = 60, seed: int = 7) -> DataFrame:
    """Deterministic REAL-format media table: seeded sine-wave WAVs and
    gradient-noise PPMs, generated executor-side (mapInPandas over an
    id range — no driver-side payload materialization)."""
    ids = spark.range(n).select(F.col("id").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid in b["media_id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(mid))
                if mid % 2 == 0:
                    sr = 8000
                    dur_s = 0.25 + float(rng.integers(0, 4)) / 8.0
                    t = np.arange(int(sr * dur_s)) / sr
                    freq = 100.0 + float(rng.integers(0, 900))
                    amp = 0.2 + 0.6 * float(rng.random())
                    payload = encode_wav(amp * np.sin(2 * np.pi * freq * t), sr)
                    rows.append((int(mid), "audio", "wav", payload,
                                 {"width": None, "height": None,
                                  "duration_ms": int(dur_s * 1000)}))
                else:
                    w, h = 8 + int(rng.integers(0, 56)), 8 + int(rng.integers(0, 40))
                    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    rows.append((int(mid), "image", "ppm", encode_ppm(img),
                                 {"width": w, "height": h, "duration_ms": None}))
            yield pd.DataFrame(rows, columns=["media_id", "modality", "fmt",
                                              "payload", "meta"])

    return ids.mapInPandas(gen, MEDIA_SCHEMA)
