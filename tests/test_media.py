"""Audio/video payload plumbing: raw codecs are real (resample,
frame-sample, stats verified against numpy ground truth computed from the
same bytes); compressed formats raise the documented stub error."""

import numpy as np
import pytest

from maskmypy_spark.operators import media
from maskmypy_spark.sources import fixtures


def test_audio_roundtrip_and_stub():
    x = (np.arange(100) * 7 % 3000 - 1500).astype(np.int64)
    data = media.encode_audio(x, "pcm16")
    back = media.decode_audio(data, "pcm16")
    assert np.array_equal(back, x.astype("<i2"))
    with pytest.raises(NotImplementedError):
        media.decode_audio(b"\x00" * 8, "mp3")
    with pytest.raises(NotImplementedError):
        media.decode_video(b"\x00" * 8, 2, 2, "h264")


def test_audio_resample_and_stats(spark):
    clips = fixtures.audio_clips(spark, 30, seed=42).cache()
    orig = {r["audio_id"]: r for r in clips.collect()}
    res = media.audio_resample(clips, 16000)
    for r in res.collect():
        o = orig[r["audio_id"]]
        assert r["sample_rate"] == 16000 and r["fmt"] == "pcm16"
        expect_n = max(1, int(round(o["n_samples"] * 16000 / o["sample_rate"])))
        assert r["n_samples"] == expect_n
        assert len(bytes(r["bytes"])) == 2 * expect_n
        assert r["caption"] == o["caption"]  # payload pass-through
    stats = {r["audio_id"]: r for r in media.audio_stats(clips).collect()}
    for aid, o in orig.items():
        x = media.decode_audio(bytes(o["bytes"]), "pcm16").astype(np.float64)
        s = stats[aid]
        assert abs(s["rms"] - float(np.sqrt(np.mean(x * x)))) < 1e-9
        assert abs(s["duration_sec"] - len(x) / o["sample_rate"]) < 1e-12


def test_video_frame_sample_feeds_image_pipeline(spark):
    from maskmypy_spark.functions import imagecodec
    from maskmypy_spark.operators import images as imops

    vids = fixtures.video_clips(spark, 20, seed=42).cache()
    orig = {r["video_id"]: r for r in vids.collect()}
    frames = media.video_frame_sample(vids, every_n=2).cache()
    got = frames.collect()
    expect_rows = sum(
        len(range(0, o["n_frames"], 2)) for o in orig.values()
    )
    assert len(got) == expect_rows
    # sampled frame pixels match a direct decode of the source video
    for r in got[:10]:
        vid, fidx = r["image_id"].rsplit("_f", 1)
        o = orig[vid]
        src = media.decode_video(bytes(o["bytes"]), o["w"], o["h"], o["fmt"])
        img = imagecodec.decode(bytes(r["bytes"]), r["fmt"])
        assert np.array_equal(img, src[int(fidx)])
        assert r["phash"] == imagecodec.average_hash(src[int(fidx)])
    # frames are image rows: the image stats operator runs on them directly
    stats = imops.image_stats(frames).collect()
    assert len(stats) == expect_rows


def test_video_stats(spark):
    vids = fixtures.video_clips(spark, 10, seed=42).cache()
    stats = {r["video_id"]: r for r in media.video_stats(vids).collect()}
    for r in vids.collect():
        src = media.decode_video(bytes(r["bytes"]), r["w"], r["h"], r["fmt"]).astype(float)
        s = stats[r["video_id"]]
        assert abs(s["brightness"] - src.mean()) < 1e-9
        assert abs(s["duration_sec"] - r["n_frames"] / r["fps"]) < 1e-12
