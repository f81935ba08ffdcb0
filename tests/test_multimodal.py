"""Multimodal binary-column plumbing (task brief) — real schema/batch
shape, deterministic fake codecs, stubbed external formats."""

from __future__ import annotations

import numpy as np
import pytest

from engine import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    return spark.createDataFrame(mm.gen_media_local(30), schema=mm.MEDIA_SCHEMA)


def test_pcm16_and_rawvid_roundtrip():
    r = np.random.default_rng(1)
    s = (r.normal(0, 1000, 512)).astype(np.int16)
    out, rate = mm.decode_pcm16(mm.encode_pcm16(s, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(s, out)
    frames = r.integers(0, 256, (4, 6, 6, 3), dtype=np.uint8)
    np.testing.assert_array_equal(frames, mm.decode_rawvid(mm.encode_rawvid(frames)))


def test_extract_features_all_modalities(spark, media_df):
    rows = {r.media_id: r for r in mm.extract_features(media_df).collect()}
    assert len(rows) == 30
    local = mm.gen_media_local(30)
    for row in local.itertuples(index=False):
        got = rows[row.media_id]
        assert got.media_type == row.media_type
        if row.media_type == "image":
            assert got.feature == "channel_means" and len(got.values) == 3
        elif row.media_type == "audio":
            assert got.feature == "rms_energy" and len(got.values) == 2048 // 256
        else:
            assert got.feature == "frame_mean" and len(got.values) == 6


def test_unsupported_codec_raises(spark):
    import pandas as pd

    pdf = pd.DataFrame([("x", "audio", "mp3", b"\x00", None, None, 44100, None)],
                       columns=[f.name for f in mm.MEDIA_SCHEMA.fields])
    df = spark.createDataFrame(pdf, schema=mm.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="external library"):
        mm.extract_features(df).collect()


def test_resize_images(spark):
    from engine.synth import gen_images_local

    df = spark.createDataFrame(gen_images_local(12))
    out = mm.resize_images(df, 8, 8).collect()
    assert len(out) == 12
    for r in out:
        assert (r.w, r.h, r.fmt) == (8, 8, "rgb8")
        assert len(bytes(r.bytes)) == 8 * 8 * 3


def test_sample_frames(spark, media_df):
    vids = media_df.filter("media_type = 'video'")
    n_vids = vids.count()
    frames = mm.sample_frames(vids, every_n=2).collect()
    assert len(frames) == n_vids * 3  # 6 frames, every 2nd
    for r in frames:
        assert r.frame_idx in (0, 2, 4)
        assert len(bytes(r.bytes)) == 8 * 8 * 3


def test_gen_media_local_numeric_fields_are_int_or_none():
    # regression: mixed int/None columns silently became float64 (24.0),
    # which Spark's NON-Arrow createDataFrame verifier rejects for
    # IntegerType — i.e. every session without the engine's Arrow conf,
    # including the driver's
    import pandas as pd
    from engine.multimodal import gen_media_local
    df = gen_media_local(12)
    for c in ("w", "h", "sample_rate", "n_frames"):
        for v in df[c]:
            assert v is None or type(v) is int, (c, v, type(v))
