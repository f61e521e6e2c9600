"""Multimodal plumbing: schema, Arrow batch shapes, deterministic stand-in
decode, frame sampling and resize arithmetic. The real codecs are stubbed
(no image/audio libs in this container) — these tests pin the Spark-side
contract that a real decoder would drop into."""

import numpy as np
import pytest

from miru_spark.pipeline.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    resize_meta,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthesize_media(spark, n=60, partitions=3).persist()
    df.count()
    return df


def test_media_schema_and_determinism(media, spark):
    rows = {r["media_id"]: r for r in media.collect()}
    assert len(rows) == 60
    again = {r["media_id"]: r for r in synthesize_media(spark, n=60, partitions=5).collect()}
    for k in rows:
        assert bytes(rows[k]["payload"]) == bytes(again[k]["payload"])  # partition-count independent
    assert rows[0]["kind"] == "image" and rows[1]["kind"] == "audio" and rows[2]["kind"] == "video"
    assert rows[1]["meta"]["sample_rate"] == 16000
    assert rows[2]["meta"]["n_frames"] is not None


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01")
    img = decode_image(b"\x00\x01", fake=True)
    assert img.shape == (4, 4, 3) and img.dtype == np.uint8


def test_extract_features_shape_and_range(media):
    feats = extract_features(media).collect()
    assert len(feats) == 60
    for r in feats:
        v = np.asarray(r["features"], dtype=np.float32)
        assert v.shape == (FEATURE_DIM,)
        assert (0.0 <= v).all() and (v <= 1.0).all()


def test_sample_frames_counts(media):
    out = sample_frames(media, every_nth=2).groupBy("media_id").count().collect()
    metas = {r["media_id"]: r["meta"]["n_frames"] for r in media.filter("kind = 'video'").collect()}
    got = {r["media_id"]: r["count"] for r in out}
    assert set(got) == set(metas)
    for mid, nf in metas.items():
        assert got[mid] == (nf + 1) // 2  # indices 0,2,4,... below n_frames


def test_resize_meta_aspect_preserved(media):
    for r in resize_meta(media, max_side=16).collect():
        assert max(r["target_w"], r["target_h"]) <= 16
        if r["width"] <= 16 and r["height"] <= 16:
            assert (r["target_w"], r["target_h"]) == (r["width"], r["height"])
        assert r["target_w"] >= 1 and r["target_h"] >= 1


def test_ppm_decode_is_real(spark):
    """Image payloads are genuine binary PPM: the pure-stdlib parser must
    recover the meta dimensions and the deterministic pixel stream."""
    import hashlib

    import numpy as np

    from miru_spark.pipeline.multimodal import decode_ppm, synthesize_media

    rows = (
        synthesize_media(spark, n=9)
        .filter("kind = 'image'")
        .select("media_id", "payload", "meta.width", "meta.height")
        .collect()
    )
    assert rows
    for r in rows:
        img = decode_ppm(bytes(r["payload"]))
        assert img.shape == (r["height"], r["width"], 3)
        seed = hashlib.md5(f"media{r['media_id']}".encode()).digest()
        need = r["width"] * r["height"] * 3
        exp = np.frombuffer((seed * (need // 16 + 1))[:need], dtype=np.uint8)
        assert np.array_equal(img.reshape(-1), exp)


def test_ppm_parser_handles_comments_and_rejects_garbage():
    import numpy as np
    import pytest

    from miru_spark.pipeline.multimodal import decode_ppm

    raster = bytes(range(2 * 3 * 3))
    ppm = b"P6\n# a comment\n3 2\n# another\n255\n" + raster
    img = decode_ppm(ppm)
    assert img.shape == (2, 3, 3) and img.reshape(-1).tolist() == list(raster)
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF not a ppm")
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n3 2\n255\n" + raster[:-1])  # truncated raster


def test_wav_and_y4m_decode_are_real(spark):
    """Audio payloads are genuine RIFF/WAV (stdlib wave parses them); video
    payloads are genuine YUV4MPEG2 streams — frame count and dimensions
    must match the metadata, pixels/samples the deterministic stream."""
    import hashlib

    import numpy as np

    from miru_spark.pipeline.multimodal import decode_wav, decode_y4m, synthesize_media

    rows = synthesize_media(spark, n=12).select(
        "media_id", "kind", "payload", "meta.*"
    ).collect()
    seen = set()
    for r in rows:
        seed = hashlib.md5(f"media{r['media_id']}".encode()).digest()
        if r["kind"] == "audio":
            samples = decode_wav(bytes(r["payload"]))
            raw = samples.view(np.uint8).tobytes()
            assert raw == (seed * (len(raw) // 16 + 1))[: len(raw)]
            seen.add("audio")
        elif r["kind"] == "video":
            frames = decode_y4m(bytes(r["payload"]))
            assert len(frames) == r["n_frames"]
            assert frames[0].shape == (r["height"], r["width"], 3)
            need = r["width"] * r["height"] * 3
            exp = np.frombuffer((seed * (need // 16 + 1))[:need], dtype=np.uint8)
            assert all(np.array_equal(f.reshape(-1), exp) for f in frames)
            seen.add("video")
    assert seen == {"audio", "video"}


def test_resize_images_is_real(spark):
    """resize_images decodes, nearest-neighbor resamples, and re-encodes a
    valid PPM whose pixels match the index mapping."""
    import numpy as np

    from miru_spark.pipeline.multimodal import (
        decode_ppm,
        resize_images,
        synthesize_media,
    )

    media = synthesize_media(spark, n=9)
    originals = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("kind = 'image'").select("media_id", "payload").collect()
    }
    out = resize_images(media, max_side=8).collect()
    assert len(out) == len(originals) > 0
    for r in out:
        small = decode_ppm(bytes(r["payload"]))
        assert small.shape == (r["height"], r["width"], 3)
        assert max(r["width"], r["height"]) <= 8
        img = decode_ppm(originals[r["media_id"]])
        h, w = img.shape[:2]
        ys = (np.arange(r["height"]) * (h / r["height"])).astype(np.int64)
        xs = (np.arange(r["width"]) * (w / r["width"])).astype(np.int64)
        assert np.array_equal(small, img[ys][:, xs])
