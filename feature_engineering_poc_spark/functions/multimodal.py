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
        nch = w.getnchannels()
        raw = w.readframes(n)
    if width != 2:
        raise ValueError(f"only PCM16 supported, got sampwidth={width}")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
    if nch > 1:
        # interleaved multi-channel: downmix so n (frames) == len(x)
        # and per-frame energies don't mix channels
        x = x.reshape(-1, nch).mean(axis=1)
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


def make_jpeg_bytes(width: int, height: int, components: int = 3) -> bytes:
    """Minimal structurally-valid JPEG: SOI + SOF0 frame header + EOI.

    Enough for any spec-compliant header parser to recover dimensions;
    carries no entropy-coded image data (synthetic metadata fixtures).
    """
    sof_len = 8 + 3 * components
    sof = bytes([0xFF, 0xC0]) + sof_len.to_bytes(2, "big") + bytes([8])
    sof += height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([components])
    for c in range(components):
        sof += bytes([c + 1, 0x11, 0x00])  # id, 1x1 sampling, qtable 0
    return b"\xff\xd8" + sof + b"\xff\xd9"


def make_mp3_bytes(duration_s: float, kbps: int = 128, sr: int = 44100) -> bytes:
    """CBR MPEG1 Layer-III shaped payload: one valid frame header + zero
    padding sized to bitrate×duration (header parsers recover sr/kbps
    and the CBR duration estimate exactly)."""
    br_idx = _MP3_BITRATE_V1_L3.index(kbps)
    sr_idx = _MP3_SR[3].index(sr)
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00])
    total = max(len(hdr), int(duration_s * kbps * 1000 / 8))
    return hdr + b"\x00" * (total - len(hdr))


def make_mp4_bytes(duration_s: float, timescale: int = 1000) -> bytes:
    """Minimal ISO-BMFF: ftyp + moov(mvhd v0) with the given duration."""

    def box(btype: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    mvhd_body = (
        bytes(4)  # version 0 + flags
        + bytes(8)  # creation + modification time
        + timescale.to_bytes(4, "big")
        + int(duration_s * timescale).to_bytes(4, "big")
        + bytes(80)  # rate/volume/reserved/matrix/predefines/next_track
    )
    return ftyp + box(b"moov", box(b"mvhd", mvhd_body))


# ------------------------------------------- header-level (metadata) codecs
#
# jpeg/mp3/mp4 are CONTAINER formats whose full pixel/sample decode needs
# external libraries this environment lacks — but their headers are
# public-specification byte layouts parseable in pure Python. These
# decoders extract real metadata (dimensions, sample rate, duration);
# the feature vector carries header fields, not content. Full content
# decode remains explicitly out of scope (see decode_batch docstring).

_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def decode_jpeg_header(payload: bytes, feature_dim: int) -> tuple[np.ndarray, dict]:
    """JPEG marker walk → SOF frame header (width, height, components).

    Metadata tier: dimensions come from the Start-Of-Frame segment
    (precision:1, height:2, width:2, components:1 — big-endian), no
    entropy-coded data is touched.
    """
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload (missing SOI)")
    i, w, h, ncomp = 2, None, None, None
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no SOF before data
            break
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:  # standalone markers
            i += 2
            continue
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        if marker in _SOF_MARKERS and i + 10 <= len(payload):
            h = int.from_bytes(payload[i + 5 : i + 7], "big")
            w = int.from_bytes(payload[i + 7 : i + 9], "big")
            ncomp = payload[i + 9]
            break
        i += 2 + seglen
    if w is None:
        raise ValueError("no SOF marker found in JPEG payload")
    head = [w / 1000.0, h / 1000.0, float(ncomp), len(payload) / 1e6]
    feat = np.zeros(feature_dim, dtype=np.float32)
    feat[: min(len(head), feature_dim)] = head[:feature_dim]
    return feat, {"width": w, "height": h, "components": ncomp}


_MP3_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_SR = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def decode_mp3_header(payload: bytes, feature_dim: int) -> tuple[np.ndarray, dict]:
    """MP3 frame-header parse: sample rate + bitrate from the first
    valid frame sync; duration ESTIMATE = payload_bits / bitrate (exact
    for CBR streams). Skips a leading ID3v2 tag (syncsafe size)."""
    i = 0
    if payload.startswith(b"ID3") and len(payload) >= 10:
        ss = payload[6:10]  # syncsafe 28-bit size
        i = 10 + ((ss[0] << 21) | (ss[1] << 14) | (ss[2] << 7) | ss[3])
    while i + 4 <= len(payload):
        b0, b1, b2 = payload[i], payload[i + 1], payload[i + 2]
        if b0 == 0xFF and (b1 & 0xE0) == 0xE0:
            version = (b1 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
            layer = (b1 >> 1) & 3  # 1=Layer III
            br_idx, sr_idx = b2 >> 4, (b2 >> 2) & 3
            if version != 1 and layer == 1 and 0 < br_idx < 15 and sr_idx != 3:
                sr = _MP3_SR[version][sr_idx]
                table = _MP3_BITRATE_V1_L3 if version == 3 else _MP3_BITRATE_V2_L3
                kbps = table[br_idx]
                dur_s = (len(payload) - i) * 8.0 / (kbps * 1000.0)
                spf = 1152 if version == 3 else 576  # samples/frame, Layer III
                n_frames = int(dur_s * sr / spf)
                head = [sr / 1000.0, dur_s, kbps / 1000.0, float(n_frames)]
                feat = np.zeros(feature_dim, dtype=np.float32)
                feat[: min(len(head), feature_dim)] = head[:feature_dim]
                return feat, {"sample_rate": sr, "bitrate_kbps": kbps,
                              "duration_ms": int(dur_s * 1000)}
        i += 1
    raise ValueError("no valid MP3 frame sync found")


def _iter_boxes(buf: bytes, start: int, end: int):
    """ISO BMFF box walk: yields (type, body_start, body_end)."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(buf[i : i + 4], "big")
        btype = buf[i + 4 : i + 8]
        hdr = 8
        if size == 1 and i + 16 <= end:  # 64-bit largesize
            size = int.from_bytes(buf[i + 8 : i + 16], "big")
            hdr = 16
        if size == 0:  # box extends to end of file
            size = end - i
        if size < hdr:
            break
        yield btype, i + hdr, min(i + size, end)
        i += size


def decode_mp4_header(payload: bytes, feature_dim: int) -> tuple[np.ndarray, dict]:
    """MP4/ISO-BMFF box walk: moov → mvhd → (timescale, duration).

    mvhd v0: 32-bit times at body[12:16]/[16:20]; v1: 64-bit at
    body[20:24]/[24:32] (after 8-byte creation/modification times).
    """
    for btype, a, b in _iter_boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ityp, ia, ib in _iter_boxes(payload, a, b):
            if ityp != b"mvhd":
                continue
            body = payload[ia:ib]
            version = body[0]
            if version == 1:
                timescale = int.from_bytes(body[20:24], "big")
                duration = int.from_bytes(body[24:32], "big")
            else:
                timescale = int.from_bytes(body[12:16], "big")
                duration = int.from_bytes(body[16:20], "big")
            dur_s = duration / timescale if timescale else 0.0
            head = [dur_s, timescale / 1000.0, len(payload) / 1e6]
            feat = np.zeros(feature_dim, dtype=np.float32)
            feat[: min(len(head), feature_dim)] = head[:feature_dim]
            return feat, {"duration_ms": int(dur_s * 1000), "timescale": timescale}
    raise ValueError("no moov/mvhd box found in MP4 payload")


_REAL_DECODERS = {"wav": decode_wav, "ppm": decode_ppm}
_HEADER_DECODERS = {
    "jpeg": decode_jpeg_header,
    "jpg": decode_jpeg_header,
    "mp3": decode_mp3_header,
    "mp4": decode_mp4_header,
}


def decode_batch(batch: pd.DataFrame, feature_dim: int, fake: bool) -> pd.DataFrame:
    """Decode one Arrow batch of media rows into feature vectors.

    Three tiers:
    - ``fmt`` in {wav, ppm}: REAL content decode (stdlib/numpy).
    - ``fmt`` in {jpeg, mp3, mp4}: HEADER/metadata decode — real
      dimensions / sample-rate / duration parsed from the container's
      public byte layout; features carry header fields, not content
      (full pixel/sample decode needs external libs this environment
      lacks and stays explicitly out of scope).
    - anything else: NotImplementedError, or the deterministic
      byte-fold stub under ``fake=True`` so batching/schema/shape
      still get exercised.
    """
    feats = []
    fmts = batch["fmt"] if "fmt" in batch else pd.Series(["raw"] * len(batch))
    for payload, fmt in zip(batch["payload"], fmts):
        key = (fmt or "").lower()
        dec = _REAL_DECODERS.get(key) or _HEADER_DECODERS.get(key)
        if dec is not None:
            feats.append(dec(bytes(payload), feature_dim)[0])
        elif fake:
            raw = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float32)
            reps = int(np.ceil(feature_dim / max(len(raw), 1)))
            feats.append(np.resize(np.tile(raw, reps), feature_dim) / 255.0)
        else:
            raise NotImplementedError(
                f"no codec for fmt={fmt!r}: wav/ppm decode content natively, "
                "jpeg/mp3/mp4 decode header metadata; full container decode "
                "needs external libs — pass fake=True for the deterministic stub"
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
    """Deterministic media table across all five decodable formats —
    content formats (sine-wave WAVs, noise PPMs) and header-metadata
    containers (JPEG/MP3/MP4 with real spec-compliant headers) —
    generated executor-side (mapInPandas over an id range — no
    driver-side payload materialization)."""
    ids = spark.range(n).select(F.col("id").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid in b["media_id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(mid))
                kind = int(mid) % 5
                if kind == 0:
                    sr = 8000
                    dur_s = 0.25 + float(rng.integers(0, 4)) / 8.0
                    t = np.arange(int(sr * dur_s)) / sr
                    freq = 100.0 + float(rng.integers(0, 900))
                    amp = 0.2 + 0.6 * float(rng.random())
                    payload = encode_wav(amp * np.sin(2 * np.pi * freq * t), sr)
                    rows.append((int(mid), "audio", "wav", payload,
                                 {"width": None, "height": None,
                                  "duration_ms": int(dur_s * 1000)}))
                elif kind == 1:
                    w, h = 8 + int(rng.integers(0, 56)), 8 + int(rng.integers(0, 40))
                    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    rows.append((int(mid), "image", "ppm", encode_ppm(img),
                                 {"width": w, "height": h, "duration_ms": None}))
                elif kind == 2:
                    w, h = 16 * (1 + int(rng.integers(0, 120))), 16 * (1 + int(rng.integers(0, 67)))
                    rows.append((int(mid), "image", "jpeg", make_jpeg_bytes(w, h),
                                 {"width": w, "height": h, "duration_ms": None}))
                elif kind == 3:
                    dur_s = 1.0 + float(rng.integers(0, 30))
                    rows.append((int(mid), "audio", "mp3", make_mp3_bytes(dur_s),
                                 {"width": None, "height": None,
                                  "duration_ms": int(dur_s * 1000)}))
                else:
                    dur_s = 5.0 + float(rng.integers(0, 120))
                    rows.append((int(mid), "video", "mp4", make_mp4_bytes(dur_s),
                                 {"width": None, "height": None,
                                  "duration_ms": int(dur_s * 1000)}))
            yield pd.DataFrame(rows, columns=["media_id", "modality", "fmt",
                                              "payload", "meta"])

    return ids.mapInPandas(gen, MEDIA_SCHEMA)
