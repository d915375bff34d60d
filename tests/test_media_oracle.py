"""Cross-checks for the independent media-oracle derivations
(plans/media_oracle.py) against the LIVE engine pure functions, so a drift
in either path fails here with a per-image/per-clip diagnosis instead of an
opaque contract-hash mismatch. The full Spark-vs-VALUES comparison runs in
tests/test_contract.py (entries image_phash_dedup / image_resize /
audio_stats / video_frame_stats).
"""

import numpy as np

from maskmypy_spark.functions import imagecodec
from maskmypy_spark.plans import media_oracle
from maskmypy_spark.sources import fixtures


def test_fixture_image_reconstruction_codec_free():
    # codec-free pixel reconstruction == the engine fixture's decoded bytes
    for i in (0, 1, 7, 55, 119):
        data, w, h, fmt, ph = fixtures.make_image(i, media_oracle.SEED)
        via_codec = imagecodec.decode(data, fmt)
        assert np.array_equal(media_oracle.fixture_image(i), via_codec), i


def test_integer_exact_avg_hash_matches_engine():
    for i in range(media_oracle._N_IMAGES):
        img = media_oracle.fixture_image(i)
        assert media_oracle.avg_hash_exact(img) == imagecodec.average_hash(img), i
        q = imagecodec.quantize(img, 5)
        assert np.array_equal(media_oracle._quantize5(img), q), i
        assert media_oracle.avg_hash_exact(q) == imagecodec.average_hash(q), i


def test_resize_rows_match_engine_kernel():
    # same nearest-neighbor index arithmetic as operators/images.py:94-96
    rows = {r[0]: r for r in media_oracle.image_resize_rows()}
    for i in (0, 3, 42, 118):
        img = media_oracle.fixture_image(i)
        h, w = img.shape[:2]
        ri = (np.arange(24) * h // 24).astype(np.int64)
        ci = (np.arange(24) * w // 24).astype(np.int64)
        expect = imagecodec.average_hash(img[ri][:, ci])
        assert rows[f"img{i:08d}"] == (f"img{i:08d}", 24, 24, expect), i


def test_ima_oracle_encoder_matches_engine_bytes():
    """The oracle's re-coded IMA encoder must produce byte-identical
    streams to functions/adpcm.py on the fixture clips (and decode back
    through the engine within the codec's SNR)."""
    from maskmypy_spark.functions import adpcm

    for i in (0, 1, 2, 17, 49):
        x, _sr = media_oracle._clip_samples(i)
        a = media_oracle._ima_encode(x)
        b = adpcm.encode_adpcm(x)
        assert a == b, i
        back = adpcm.decode_adpcm(a, len(x))
        assert adpcm.snr_db(x, back) > 15.0, i


def test_row_counts():
    assert len(media_oracle.phash_dedup_rows()) == 240
    assert len(media_oracle.image_resize_rows()) == 120
    assert len(media_oracle.audio_stats_rows()) == 100
    assert len(media_oracle.video_frame_stats_rows()) == 192
    assert len(media_oracle.image_420_rows()) == 80
    assert len(media_oracle.image_prog_rows()) == 80
    assert len(media_oracle.gif_rows()) == 90
    assert len(media_oracle.gif_frame_stats_rows()) == 160


def test_tile_image_reconstruction_codec_free():
    # codec-free pixel reconstruction == the flat-tile fixture's decoded
    # bytes, and the integer-exact hash agrees with the engine's float one
    for i in (0, 1, 13, 42, 79):
        data, w, h, fmt, ph = fixtures.make_tile_image(i, media_oracle.SEED)
        img = media_oracle.fixture_tile_image(i)
        assert np.array_equal(img, imagecodec.decode(data, fmt)), i
        assert media_oracle.avg_hash_exact(img) == ph, i


def test_tile_corpus_jpg420_roundtrip_pixel_exact():
    """The property the image_decode_420 oracle RESTS ON: the flat-tile
    corpus round-trips the 4:2:0 codec pixel-exactly (MCU-aligned constant
    tiles -> DC-only blocks with quality-98 quant step 1, constant chroma
    per subsampling neighborhood). If an engine change breaks this, the
    contract entry's phash-of-original oracle stops being a decode proof —
    fail here with the image index instead."""
    for i in range(media_oracle._N_TILE):
        img = media_oracle.fixture_tile_image(i)
        back = imagecodec.decode(imagecodec.encode(img, "jpg420"), "jpg420")
        assert np.array_equal(img, back), i


def test_tile_corpus_jpgprog_roundtrip_pixel_exact():
    """Same property for the image_decode_prog oracle: the progressive
    (SOF2) writer re-codes the identical quantized coefficients, so the
    corpus must round-trip pixel-exactly through the 10-scan path too —
    and bit-identically to the baseline-4:2:0 decode."""
    for i in range(media_oracle._N_TILE):
        img = media_oracle.fixture_tile_image(i)
        prog = imagecodec.decode(imagecodec.encode(img, "jpgprog"), "jpgprog")
        assert np.array_equal(img, prog), i


def test_phash_dedup_recovers_planted_pairs():
    # every planted lossy re-encode must cluster with its original, and the
    # keeper must be the cluster minimum
    rows = {r[0]: r for r in media_oracle.phash_dedup_rows()}
    n_joined = 0
    for i in range(media_oracle._N_IMAGES):
        a, b = f"img{i:08d}", f"img{i:08d}_q"
        if rows[a][1] == rows[b][1]:
            n_joined += 1
        assert rows[rows[a][1]][2] == 1  # the keeper keeps itself
    # quantization at PSNR~41dB keeps phash within the hamming budget for
    # the overwhelming majority of the corpus
    assert n_joined >= 110, n_joined


def test_png_corpus_decode_matches_codec_free_canonical():
    """The image_decode_png oracle's cross-check: for every web-PNG fixture
    the engine's full decode of the encoded bytes (filters/palette/alpha/
    depth/Adam7 machinery) must equal the codec-free canonical RGB derived
    by plans/media_oracle.py:_png_canonical, and the stored phash must
    match the integer-exact hash of that canonical."""
    from maskmypy_spark.functions import png

    rows = {r[0]: r for r in media_oracle.png_rows()}
    seen_layouts = set()
    for i in range(media_oracle._N_PNG):
        data, w, h, layout, fmt, ph = fixtures.make_web_png(i, media_oracle.SEED)
        l2, canon = media_oracle._png_canonical(i)
        assert layout == l2, i
        seen_layouts.add(layout)
        dec = png.decode(data)
        assert np.array_equal(dec, canon), (i, layout)
        assert ph == media_oracle.avg_hash_exact(canon), (i, layout)
        assert rows[f"web{i:08d}"] == (f"web{i:08d}", layout, w, h, ph), i
    assert seen_layouts == set(media_oracle._PNG_LAYOUTS)


def test_gif_corpus_decode_matches_codec_free_canonical():
    """The image_decode_gif oracle's cross-check: for every web-GIF fixture
    the engine's full decode of the encoded bytes (LZW/sub-blocks/local
    tables/interlace/GCE machinery) must equal the codec-free canonical RGB
    derived by plans/media_oracle.py:_gif_canonical, and the stored phash
    must match the integer-exact hash of that canonical."""
    from maskmypy_spark.functions import gif

    rows = {r[0]: r for r in media_oracle.gif_rows()}
    seen_layouts = set()
    for i in range(media_oracle._N_GIF):
        data, w, h, layout, fmt, ph = fixtures.make_web_gif(i, media_oracle.SEED)
        l2, canon = media_oracle._gif_canonical(i)
        assert layout == l2, i
        seen_layouts.add(layout)
        dec = gif.decode(data)
        assert np.array_equal(dec, canon), (i, layout)
        assert ph == media_oracle.avg_hash_exact(canon), (i, layout)
        assert rows[f"gif{i:08d}"] == (f"gif{i:08d}", layout, w, h, ph), i
    assert seen_layouts == set(media_oracle._GIF_LAYOUTS)


def test_gif_animation_compositing_matches_independent_path():
    """The gif_frame_stats oracle's cross-check: the engine's composited
    frames (decode_frames over the real encoded bytes) must equal the
    independent spec-semantics compositing of the closed-form index planes
    (_gif_anim_frames), for every disposal/transparency/local-palette
    scenario."""
    from maskmypy_spark.functions import gif

    seen = set()
    for i in range(media_oracle._N_GIF_ANIM):
        data = fixtures.make_gif_animation(i)
        eng = np.stack([f for _d, f in gif.decode_frames(data)])
        orc = media_oracle._gif_anim_frames(i)
        scen = fixtures.GIF_ANIM_SCENARIOS[i % 4]
        seen.add(scen)
        assert np.array_equal(eng, orc), (i, scen)
    assert seen == set(media_oracle._GIF_ANIM_SCENARIOS)
