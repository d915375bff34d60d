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


def test_adpcm_codec():
    """IMA ADPCM (functions/adpcm.py): 4:1 size, tracking SNR on an
    audio-like signal, exact nibble packing, n_samples trim."""
    from maskmypy_spark.functions import adpcm

    t = np.arange(2001, dtype=np.float64)
    x = np.round(8000.0 * np.sin(2 * np.pi * 440.0 * t / 16000.0)).astype(np.int64)
    data = adpcm.encode_adpcm(x)
    assert len(data) == (len(x) + 1) // 2  # 4:1 vs pcm16
    back = media.decode_audio(data, "adpcm", len(x))
    assert len(back) == len(x)
    assert adpcm.snr_db(x, back) > 20.0  # standard IMA quality on a tone
    # deterministic
    assert adpcm.encode_adpcm(x) == data


def test_audio_transcode_adpcm_pipeline(spark):
    """Compressed audio is a first-class pipeline citizen: transcode to
    adpcm, then resample + stats run on the compressed bytes with stats
    close to the pcm path (codec SNR bound, not plumbing loss)."""
    clips = fixtures.audio_clips(spark, 12, seed=42).cache()
    comp = media.audio_transcode(clips, "adpcm").cache()
    for r in comp.collect():
        assert r["fmt"] == "adpcm"
        assert len(bytes(r["bytes"])) == (r["n_samples"] + 1) // 2
    base = {r["audio_id"]: r for r in media.audio_stats(clips).collect()}
    got = {r["audio_id"]: r for r in media.audio_stats(comp).collect()}
    for aid, s in got.items():
        assert s["duration_sec"] == base[aid]["duration_sec"]
        assert abs(s["rms"] - base[aid]["rms"]) / base[aid]["rms"] < 0.05
    res = media.audio_resample(comp, 16000).collect()
    assert all(r["fmt"] == "pcm16" and r["sample_rate"] == 16000 for r in res)


def test_video_transcode_mjpeg_pipeline(spark):
    """Compressed video end-to-end: rawrgb -> mjpeg (every frame a real
    JFIF stream), frames decode at PSNR >= 40 dB, and frame-sample/stats
    run on the compressed bytes unchanged."""
    from maskmypy_spark.functions import imagecodec

    vids = fixtures.video_clips(spark, 8, seed=42).cache()
    comp = media.video_transcode(vids, "mjpeg").cache()
    orig = {r["video_id"]: r for r in vids.collect()}
    for r in comp.collect():
        assert r["fmt"] == "mjpeg"
        o = orig[r["video_id"]]
        a = media.decode_video(bytes(o["bytes"]), o["w"], o["h"], o["fmt"])
        b = media.decode_video(bytes(r["bytes"]), r["w"], r["h"], "mjpeg")
        assert a.shape == b.shape
        for fa, fb in zip(a, b):
            assert imagecodec.psnr(fa, fb) >= 40.0
    # the image-pipeline handoff is format-transparent
    frames = media.video_frame_sample(comp, every_n=2)
    n = frames.count()
    assert n == sum(len(range(0, o["n_frames"], 2)) for o in orig.values())


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
