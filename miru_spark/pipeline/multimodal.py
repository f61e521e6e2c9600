"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators over `mapInPandas`. ALL THREE modalities decode for REAL over
uncompressed standard formats, pure stdlib: images are binary PPM/P6
(`decode_ppm`), audio is RIFF/WAV PCM16 (`decode_wav`, stdlib `wave`),
video is YUV4MPEG2 C444 (`decode_y4m`). What stays gated is COMPRESSED
codecs (jpeg/mp3/h264): PIL is used opportunistically when present, and
the deterministic md5 stand-in remains for payloads this container cannot
decode. The Spark-side plumbing — schema, partition sizing, UDF
signatures, Arrow batch shapes — is real and tested.

At 100 TB: binary payloads NEVER go through a shuffle — all transforms here
are map-only (mapInPandas), and outputs carry only features/metadata, so
downstream joins move kilobytes, not blobs. Partition sizing is by bytes
(`spark.sql.files.maxPartitionBytes`), not rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def _image_pixels(i: int, w: int, h: int) -> bytes:
    """Deterministic RGB pixel stream: md5(f"media{i}") tiled to w*h*3."""
    return _seed_bytes(i, w * h * 3)


def synthesize_media(spark: SparkSession, n: int = 100, partitions: int = 4) -> DataFrame:
    """Deterministic media table in REAL standard formats: images are
    binary PPM (P6), audio is RIFF/WAV PCM16 (written via the stdlib
    `wave` module), video is YUV4MPEG2 C444 — every payload genuinely
    parses with the pure-stdlib decoders below."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                w = 32 + i % 32 if kind != "audio" else None
                h = 32 + i % 16 if kind != "audio" else None
                n_frames = (i % 8 + 1) if kind == "video" else None
                if kind == "image":
                    payload = b"P6\n%d %d\n255\n" % (w, h) + _image_pixels(i, w, h)
                elif kind == "audio":
                    payload = _wav_payload(i, n_samples=128 + i % 128)
                else:
                    payload = _y4m_payload(i, w, h, n_frames)
                meta = {
                    "width": w,
                    "height": h,
                    "n_frames": n_frames,
                    "sample_rate": 16000 if kind == "audio" else None,
                }
                rows.append((i, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _seed_bytes(i: int, need: int) -> bytes:
    seed = hashlib.md5(f"media{i}".encode()).digest()
    return (seed * (need // len(seed) + 1))[:need]


def _wav_payload(i: int, n_samples: int, rate: int = 16000) -> bytes:
    """REAL RIFF/WAV file (PCM16 mono) via the stdlib `wave` module; the
    sample bytes are the deterministic md5 stream."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(_seed_bytes(i, n_samples * 2))
    return buf.getvalue()


def _y4m_payload(i: int, w: int, h: int, n_frames: int) -> bytes:
    """REAL YUV4MPEG2 stream (C444: three full-resolution planes per frame),
    every frame carrying the deterministic md5 raster."""
    header = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (w, h)
    frame = b"FRAME\n" + _seed_bytes(i, w * h * 3)
    return header + frame * n_frames


try:  # real decoder if the container ships one (this sandbox does not)
    from PIL import Image as _PILImage  # pragma: no cover
except ImportError:
    _PILImage = None


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL image decode, pure stdlib: parse a binary PPM (P6) — magic,
    whitespace-separated width/height/maxval header, then raw RGB rows.
    Returns (height, width, 3) uint8. No PIL/opencv needed: P6 is an
    uncompressed standard format, which is exactly what a pre-decode
    normalization stage in a media pipeline would write anyway."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header: three ASCII ints after the magic, separated by whitespace
    # (comments '#...' permitted per the spec), then ONE whitespace byte
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def decode_wav(payload: bytes) -> np.ndarray:
    """REAL audio decode via the stdlib `wave` module: returns the PCM16
    mono samples as int16. RIFF/WAV is the uncompressed standard an audio
    pipeline's normalization stage writes; compressed codecs (mp3/opus)
    would need ffmpeg, which this container lacks."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise ValueError("expected PCM16 mono WAV")
        raw = wf.readframes(wf.getnframes())
    return np.frombuffer(raw, dtype=np.int16)


def decode_y4m(payload: bytes) -> list[np.ndarray]:
    """REAL video decode, pure stdlib: parse a YUV4MPEG2 (C444) stream —
    space-separated header tags, then `FRAME\\n` + w*h*3 raw bytes per
    frame. Returns the list of (h, w, 3) uint8 frames."""
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    chroma = None
    for tag in header[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C":
            chroma = tag
    # the spec DEFAULT with no C tag is 4:2:0 (frame = w*h*1.5) — reject it
    # like any other unsupported mode instead of silently sizing frames 444
    if chroma != b"C444":
        raise ValueError(f"unsupported chroma mode {chroma!r} (only C444)")
    if not w or not h:
        raise ValueError("missing W/H in YUV4MPEG2 header")
    frames, pos, fsize = [], nl + 1, w * h * 3
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("bad FRAME marker")
        raster = payload[fnl + 1 : fnl + 1 + fsize]
        if len(raster) != fsize:
            raise ValueError("truncated frame raster")
        frames.append(np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3))
        pos = fnl + 1 + fsize
    return frames


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Image decode. PPM (P6) payloads decode FOR REAL via the pure-stdlib
    parser; other formats use PIL when the container ships it; the
    deterministic md5-derived stand-in (fake=True) remains for payloads in
    codec formats this container cannot decode (jpeg/png without PIL)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if not fake:
        if _PILImage is not None:  # pragma: no cover - no PIL in sandbox
            import io

            return np.asarray(_PILImage.open(io.BytesIO(payload)).convert("RGB"))
        raise NotImplementedError(
            "non-PPM image decode requires PIL/opencv — not available in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    h = hashlib.md5(payload).digest()
    side = 4
    arr = np.frombuffer((h * (side * side * 3 // len(h) + 1))[: side * side * 3], dtype=np.uint8)
    return arr.reshape(side, side, 3)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """payload → FEATURE_DIM float vector, Arrow-batched mapInPandas.
    Every modality decodes for real (PPM / WAV / Y4M parsers) and the
    feature is a mean over decoded byte groups — a deterministic stand-in
    for a learned encoder, computed on genuinely decoded samples/pixels.
    ``fake`` only governs non-PPM image payloads when PIL is absent."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                payload = bytes(payload)
                if kind == "audio":
                    # real WAV decode; features over the raw sample bytes
                    flat = decode_wav(payload).view(np.uint8).astype(np.float64)
                elif kind == "video":
                    # real Y4M decode; features over the FIRST frame
                    flat = decode_y4m(payload)[0].reshape(-1).astype(np.float64)
                else:
                    flat = decode_image(payload, fake=fake).reshape(-1).astype(np.float64)
                reps = int(np.ceil(FEATURE_DIM * 3 / flat.size)) if flat.size else 1
                base = np.tile(flat, reps)[: FEATURE_DIM * 3].reshape(FEATURE_DIM, 3)
                vecs.append((base.mean(axis=1) / 255.0).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": vecs}
            )

    return media.mapInPandas(feats, schema=out_schema)


def sample_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index
    (real impl would ffmpeg-seek; here frames are metadata-driven)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


def resize_images(media: DataFrame, max_side: int = 16) -> DataFrame:
    """REAL byte-level resize: decode each PPM image, nearest-neighbor
    resample to fit max_side (aspect-preserving, never upscale), re-encode
    as PPM. Map-only (mapInPandas) — blobs never shuffle; output payloads
    are standard images any PPM reader accepts."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_ppm(bytes(payload))
                h, w = img.shape[:2]
                scale = min(max_side / w, max_side / h, 1.0)
                # ceil, matching resize_meta's plan EXACTLY — int() truncation
                # made the executor emit 16x10 where the planner said 16x11
                tw = max(int(np.ceil(w * scale)), 1)
                th = max(int(np.ceil(h * scale)), 1)
                ys = (np.arange(th) * (h / th)).astype(np.int64)
                xs = (np.arange(tw) * (w / tw)).astype(np.int64)
                small = img[ys][:, xs]
                enc = b"P6\n%d %d\n255\n" % (tw, th) + small.tobytes()
                out.append((int(mid), tw, th, enc))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "payload"])

    return media.filter(F.col("kind") == "image").mapInPandas(rs, schema=out_schema)


def resize_meta(media: DataFrame, max_side: int = 16) -> DataFrame:
    """Resize planning (aspect-preserving target dims) — pure JVM arithmetic;
    the byte-level resample is the stubbed decode's job."""
    imgs = media.filter(F.col("kind") == "image")
    scale = F.least(
        F.lit(max_side) / F.col("meta.width"), F.lit(max_side) / F.col("meta.height"), F.lit(1.0)
    )
    return imgs.select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.ceil(F.col("meta.width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("meta.height") * scale).cast("int").alias("target_h"),
    )
