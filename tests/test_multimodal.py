"""Multimodal plumbing: binary columns + typed metadata through
Arrow-batched mapInPandas, with the codec step stubbed (no imaging libs in
this environment — the decode integration point must raise cleanly)."""

import math

import pytest
from pyspark.sql import functions as F

from oasysdb_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.synthesize_media_from_documents(spark, sf_dir)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "meta"]
    assert media.schema["content"].dataType.typeName() == "binary"
    assert media.schema["meta"].dataType["media_type"].dataType.typeName() == "string"


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...")


def test_extract_features(media):
    feats = mm.extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == media.count()
    # cross-check one row against the local reference implementation
    sample = media.orderBy("media_id").first()
    n, mean, std, ent = mm.fake_decode_stats(bytes(sample["content"]))
    got = rows[sample["media_id"]]
    assert got["n_bytes"] == n
    assert got["byte_mean"] == pytest.approx(round(mean, 6))
    assert got["entropy8"] == pytest.approx(round(ent, 6))
    assert 0 <= got["entropy8"] <= 8.0


def test_frame_sample(media):
    frames = mm.frame_sample(media, every_n=10)
    agg = frames.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("frame_index").alias("mx")
    )
    meta = media.select("media_id", F.col("meta.n_frames").alias("nf"))
    joined = {r["media_id"]: r for r in agg.join(meta, "media_id").collect()}
    for r in joined.values():
        assert r["n"] == math.ceil(r["nf"] / 10)
        assert r["mx"] <= r["nf"] - 1
        assert r["mx"] % 10 == 0

def test_codec_roundtrip_ppm_and_bmp():
    """The native decoders are real: encode→decode is the identity for
    PPM (P6) and 24-bit BMP, including non-multiple-of-4 widths (BMP row
    padding) and PPM header comments."""
    import numpy as np

    from oasysdb_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 3)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_image(encode_ppm(arr)) == arr).all()
        assert (decode_image(encode_bmp(arr)) == arr).all()

    # PPM header comments are tolerated
    arr = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    with_comment = b"P6\n# a comment\n2 2\n255\n" + arr.tobytes()
    assert (decode_image(with_comment) == arr).all()

    # compressed formats still raise the documented integration error
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_pixel_stats_decode_matches_source_bytes(spark):
    """End-to-end through real blobs: pixel means recomputed from the
    source text must equal the decoded-image means."""
    from oasysdb_spark.operators.multimodal import (
        decode_image,
        synthesize_ppm_media_from_documents,
    )

    media = synthesize_ppm_media_from_documents(spark, "/root/testdata/sf0.001")
    row = media.orderBy("media_id").first()
    arr = decode_image(bytes(row["content"]))
    assert arr.shape[1] == 16 and arr.shape[2] == 3


def test_binary_file_source_to_pixel_features(spark, tmp_path):
    """Real files on disk -> binaryFile source -> native decode ->
    pixel features: the ingest path an actual image corpus takes."""
    import numpy as np

    from oasysdb_spark.operators.multimodal import (
        encode_bmp,
        encode_ppm,
        extract_pixel_features,
        load_media_dir,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(11)
    arrays = {}
    for i in range(4):
        arr = rng.integers(0, 256, size=(4 + i, 5, 3), dtype=np.uint8)
        blob = encode_ppm(arr) if i % 2 == 0 else encode_bmp(arr)
        ext = "ppm" if i % 2 == 0 else "bmp"
        (d / f"img_{i}.{ext}").write_bytes(blob)
        arrays[i] = arr

    media = load_media_dir(spark, str(d), glob="img_*")
    assert media.count() == 4
    feats = {
        (r["height"], r["width"]): r["pix_mean"]
        for r in extract_pixel_features(media).collect()
    }
    assert len(feats) == 4
    for i, arr in arrays.items():
        h, w, _ = arr.shape
        expected = int(arr.sum()) / (h * w * 3.0)
        assert feats[(h, w)] == expected


def test_pillow_hook_decodes_png_corpus(spark, tmp_path):
    """Compressed-image decode exercised IN CI with zero dependencies: a
    real PNG corpus (stdlib encoder) through load_media_dir ->
    decode_image (native stdlib inflate+unfilter; Pillow is only the
    fallback for exotic variants now) -> pixel features."""
    import numpy as np

    from oasysdb_spark.operators.multimodal import (
        encode_png,
        extract_pixel_features,
        load_media_dir,
    )

    d = tmp_path / "pngs"
    d.mkdir()
    rng = np.random.default_rng(23)
    arrays = {}
    for i in range(3):
        arr = rng.integers(0, 256, size=(6 + i, 7, 3), dtype=np.uint8)
        (d / f"img_{i}.png").write_bytes(encode_png(arr))
        arrays[i] = arr

    media = load_media_dir(spark, str(d), glob="img_*")
    feats = {
        (r["height"], r["width"]): r["pix_mean"]
        for r in extract_pixel_features(media).collect()
    }
    assert len(feats) == 3
    for arr in arrays.values():
        h, w, _ = arr.shape
        assert feats[(h, w)] == int(arr.sum()) / (h * w * 3.0)


def _forward_filter(ftype: int, cur: bytes, prev: bytes, bpp: int) -> bytes:
    """Reference forward PNG filter (RFC 2083 §6) used to build test
    scanlines that exercise every unfilter branch."""
    out = bytearray(len(cur))
    for i in range(len(cur)):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[i] = (cur[i] - pred) & 0xFF
    return bytes(out)


def test_png_decoder_all_filters_and_color_types():
    """Unfiltering must invert all five scanline filters, and each color
    type must normalize to (h, w, 3) RGB."""
    import struct
    import zlib

    import numpy as np

    from oasysdb_spark.operators.multimodal import (
        PNG_SIGNATURE,
        decode_image,
        encode_png,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(7)

    # every filter type on an RGB image: forward-filter row y with y % 5
    arr = rng.integers(0, 256, size=(10, 5, 3), dtype=np.uint8)
    raw = bytearray()
    prev = bytes(5 * 3)
    for y in range(10):
        cur = arr[y].tobytes()
        f = y % 5
        raw += bytes([f]) + _forward_filter(f, cur, prev, bpp=3)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 5, 10, 8, 2, 0, 0, 0)
    png = (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (decode_image(png) == arr).all()

    # encoder/decoder round trip (filter-0 path, multi-IDAT irrelevant)
    rt = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    assert (decode_image(encode_png(rt)) == rt).all()

    # grayscale (0), gray+alpha (4), RGBA (6), palette (3)
    def build(color, channels, w=4, h=3, plte=None):
        px = rng.integers(0, 256, size=(h, w * channels), dtype=np.uint8)
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        body = chunk(b"IHDR", ihdr)
        if plte is not None:
            body += chunk(b"PLTE", plte.tobytes())
        body += chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        return PNG_SIGNATURE + body, px.reshape(h, w, channels)

    png, px = build(0, 1)
    assert (decode_image(png) == np.repeat(px, 3, axis=2)).all()
    png, px = build(4, 2)
    assert (decode_image(png) == np.repeat(px[:, :, :1], 3, axis=2)).all()
    png, px = build(6, 4)
    assert (decode_image(png) == px[:, :, :3]).all()
    plte = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    png, px = build(3, 1, plte=plte)
    assert (decode_image(png) == plte[px[:, :, 0]]).all()

    # 16-bit depth is outside the native tier -> NotImplementedError
    # (no Pillow in the container; with Pillow it would decode)
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    deep = (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr16)
        + chunk(b"IDAT", zlib.compress(b"\x00" * (2 * (2 * 6 + 1))))
        + chunk(b"IEND", b"")
    )
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_image(deep)


def test_audio_codec_roundtrip_and_features(spark, tmp_path):
    """WAV PCM is the audio analog of PPM/BMP: encode→decode identity
    (incl. stereo downmix and odd-size word alignment), then real files
    through binaryFile → decode → duration/RMS/peak features."""
    import numpy as np

    from oasysdb_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
        extract_audio_features,
        load_media_dir,
    )

    rng = np.random.default_rng(5)
    mono = rng.integers(-2000, 2000, size=1601, dtype=np.int16)  # odd length
    samples, rate = decode_audio(encode_wav(mono, 8000))
    assert rate == 8000 and (samples == mono).all()

    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03....")  # mp3-ish: external codec point

    d = tmp_path / "clips"
    d.mkdir()
    clips = {}
    for i in range(3):
        n = 4000 * (i + 1)
        s = rng.integers(-3000, 3000, size=n, dtype=np.int16)
        (d / f"clip_{i}.wav").write_bytes(encode_wav(s, 16_000))
        clips[n] = s

    media = load_media_dir(spark, str(d), glob="clip_*", media_type="audio/wav")
    feats = {r["n_samples"]: r for r in extract_audio_features(media).collect()}
    assert len(feats) == 3
    for n, s in clips.items():
        r = feats[n]
        x = s.astype(np.float64)
        assert r["duration_s"] == n / 16_000.0
        assert r["rms"] == pytest.approx(float(np.sqrt((x * x).mean())))
        assert r["peak"] == int(np.abs(s).max())


def test_dhash_perceptual_properties(spark, sf_dir):
    """dHash through the real codec: identical payloads hash equal; the
    injected one-pixel near-copy is within hamming 2 of its source
    (usually 0 — one gradient sign at most can flip per neighboring
    block pair); unrelated docs rarely collide."""
    from oasysdb_spark.operators.multimodal import (
        extract_dhash,
        synthesize_ppm16_with_near_copies,
    )

    media = synthesize_ppm16_with_near_copies(spark, sf_dir)
    hashes = {r["media_id"]: r["dhash"] for r in extract_dhash(media).collect()}
    copies = [(m - 100000, m) for m in hashes if m >= 100000]
    assert copies
    for src, cp in copies:
        ham = bin(hashes[src] ^ hashes[cp]).count("1")
        assert ham <= 2, f"near-copy {cp} drifted hamming {ham} from {src}"
    base_ids = [m for m in hashes if m < 100000]
    distinct = len({hashes[m] for m in base_ids})
    assert distinct > 0.9 * len(base_ids)  # word-salad docs rarely collide


def test_dhash_rejects_wrong_size(spark):
    """The 16x16 contract is enforced with a clean error."""
    import numpy as np
    import pytest as _pytest

    from oasysdb_spark.errors import InvalidArgumentError
    from oasysdb_spark.operators.multimodal import encode_ppm, extract_dhash

    blob = encode_ppm(np.zeros((4, 4, 3), dtype=np.uint8))
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, content binary")
    with _pytest.raises(Exception) as ei:
        extract_dhash(df).collect()
    assert "16x16" in str(ei.value)


def test_dhash_wide_near_pairs_exhaustive_vs_quadratic_truth(spark, sf_dir):
    """The 256-bit wide path (r6 scale lever) must return EXACTLY the
    pairs the quadratic all-pairs truth finds at hamming <= 3 — banding
    loses nothing (pigeonhole over four 64-bit words) and adds nothing
    (exact bit_count verify) — and must recall every injected one-pixel
    near-copy the 56-bit path recalls."""
    from oasysdb_spark.operators.multimodal import (
        extract_dhash_wide,
        multimodal_dhash_near_pairs,
        synthesize_ppm16_with_near_copies,
    )

    media = synthesize_ppm16_with_near_copies(spark, sf_dir)
    wide = {
        r["media_id"]: tuple(r["dhash_words"])
        for r in extract_dhash_wide(media).collect()
    }

    def ham(a, b):
        return sum(
            bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")
            for x, y in zip(a, b)
        )

    ids = sorted(wide)
    truth = {
        (a, b): ham(wide[a], wide[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(wide[a], wide[b]) <= 3
    }
    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in multimodal_dhash_near_pairs(
            spark, sf_dir, max_hamming=3, top_n=10**6, hash_bits=256
        ).collect()
    }
    assert got == truth
    # equal recall on the injected near-copies vs the 56-bit narrow twin
    # (the pre-r7 default; hash_bits now defaults to 256)
    narrow = {
        (r["media_a"], r["media_b"])
        for r in multimodal_dhash_near_pairs(
            spark, sf_dir, max_hamming=3, top_n=10**6, hash_bits=56
        ).collect()
    }
    injected_narrow = {(a, b) for a, b in narrow if b == a + 100000}
    injected_wide = {(a, b) for a, b in got if b == a + 100000}
    assert injected_wide >= injected_narrow
    assert injected_wide  # the one-pixel copies are found at all


def test_dhash_wide_band_budget_derivation(spark):
    """Band count derives from the hamming budget: a budget of 7 gets
    eight 32-bit bands, and a pair differing in 5 bits packed inside
    ONE 32-bit band (worst case for banding) is still found via any of
    the 7 untouched bands — including bands at word boundaries. Budgets
    past 31 are rejected."""
    import pytest as _pytest

    from oasysdb_spark.errors import InvalidArgumentError
    from oasysdb_spark.operators.multimodal import (
        _wide_band_cols,
        banded_hamming_pairs_wide,
    )

    base = [0x0123456789ABCDEF, -0x7EDCBA9876543211, 0x0F0F0F0F0F0F0F0F, -1]
    # flip 5 bits inside word 1's low 32-bit band (bits 64..95 → band 2)
    flipped = list(base)
    flipped[1] ^= 0b11111 << 10
    df = spark.createDataFrame(
        [(1, base), (2, flipped)], "media_id long, dhash_words array<long>"
    )
    names, exprs = _wide_band_cols("dhash_words", 7)
    assert len(names) == 8
    banded = df.select("media_id", "dhash_words", *exprs)
    rows = banded_hamming_pairs_wide(
        banded,
        id_col="media_id",
        words_col="dhash_words",
        band_cols=names,
        max_hamming=7,
        top_n=10,
        out_names=("media_a", "media_b"),
    ).collect()
    assert [(r["media_a"], r["media_b"], r["hamming"]) for r in rows] == [
        (1, 2, 5)
    ]
    with _pytest.raises(InvalidArgumentError):
        _wide_band_cols("dhash_words", 32)


def test_dhash_wide_small_hamming_budgets(spark, sf_dir):
    """r7 regression (advisor-confirmed crash): budgets 0 and 1 used to
    derive a 2-band split whose 128-bit band value neither a 64-bit
    literal nor one word read can express. The ladder now starts at 4
    bands (one whole word each), so tiny budgets must WORK and return
    exactly the quadratic truth at that budget."""
    from oasysdb_spark.operators.multimodal import (
        _wide_band_cols,
        extract_dhash_wide,
        multimodal_dhash_near_pairs,
        synthesize_ppm16_with_near_copies,
    )

    for budget in (0, 1):
        names, _ = _wide_band_cols("dhash_words", budget)
        assert len(names) == 4  # never a >64-bit band

    media = synthesize_ppm16_with_near_copies(spark, sf_dir)
    wide = {
        r["media_id"]: tuple(r["dhash_words"])
        for r in extract_dhash_wide(media).collect()
    }

    def ham(a, b):
        return sum(
            bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")
            for x, y in zip(a, b)
        )

    ids = sorted(wide)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(wide[a], wide[b]) == 0
    }
    got = {
        (r["media_a"], r["media_b"])
        for r in multimodal_dhash_near_pairs(
            spark, sf_dir, max_hamming=0, top_n=10**6
        ).collect()
    }
    assert got == truth
    assert truth  # the fixture's zero-pad clique guarantees exact dups


def test_audio_fingerprint_perceptual_properties(spark, sf_dir):
    """Energy-contour fingerprints through the real WAV codec: the
    injected one-sample near-copy stays within hamming 1 of its source
    (only frame 0's energy moved, so only the frame0-vs-frame1 bit can
    flip); distinct docs rarely collide."""
    from oasysdb_spark.operators.multimodal import (
        extract_audio_fingerprint,
        synthesize_wav_media_from_documents,
    )

    media = synthesize_wav_media_from_documents(spark, sf_dir)
    fps = {
        r["media_id"]: r["fingerprint"]
        for r in extract_audio_fingerprint(media).collect()
    }
    copies = [(m - 100000, m) for m in fps if m >= 100000]
    assert copies
    for src, cp in copies:
        assert bin(fps[src] ^ fps[cp]).count("1") <= 1
    base = [m for m in fps if m < 100000]
    assert len({fps[m] for m in base}) > 0.9 * len(base)


def test_gif_roundtrip_exercises_real_lzw():
    """encode_gif -> decode_image must roundtrip exactly. The cases force
    the LZW paths a wild GIF hits: tiny palette (2 colors), structured
    gradients (dictionary growth + variable code width), high-entropy
    noise over a full 256-color palette (KwKwK + width growth to >9
    bits), and an image large enough to trip the 4095 clear-and-reset."""
    import numpy as np

    from oasysdb_spark.operators.multimodal import decode_image, encode_gif

    rng = np.random.default_rng(7)

    two_tone = np.zeros((16, 16, 3), np.uint8)
    two_tone[::2] = 255
    gradient = np.stack(
        [np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))] * 3, axis=2
    )
    noise = rng.integers(0, 256, size=(48, 48), dtype=np.uint8)
    noise_rgb = np.stack([noise, noise, noise], axis=2)
    big = np.stack(
        [rng.integers(0, 250, size=(128, 128), dtype=np.uint8)] * 3, axis=2
    )

    for arr in (two_tone, gradient, noise_rgb, big):
        out = decode_image(encode_gif(arr))
        assert out.dtype == np.uint8 and out.shape == arr.shape
        assert np.array_equal(out, arr), "GIF roundtrip must be exact"


def test_gif_interlaced_hits_codec_boundary():
    """An interlaced GIF is outside the native tier: with no Pillow in
    the container the documented NotImplementedError boundary fires."""
    import numpy as np
    import pytest

    from oasysdb_spark.operators.multimodal import decode_image, encode_gif

    content = bytearray(encode_gif(np.zeros((4, 4, 3), np.uint8)))
    # image descriptor flag byte: set the interlace bit
    pos = content.index(0x2C, 6)
    content[pos + 9] |= 0x40
    try:
        import PIL  # noqa: F401

        has_pillow = True
    except ImportError:
        has_pillow = False
    if has_pillow:
        pytest.skip("Pillow present: the fallback handles interlaced GIFs")
    with pytest.raises(NotImplementedError):
        decode_image(bytes(content))


def test_gif_media_flows_through_pixel_features(spark):
    """The decode plumbing is format-agnostic: a media frame of GIF
    blobs runs through extract_pixel_features' Arrow mapInPandas path
    and yields exactly the per-channel means numpy computes from the
    same arrays."""
    import numpy as np

    from oasysdb_spark.operators.multimodal import (
        encode_gif,
        extract_pixel_features,
    )

    rng = np.random.default_rng(11)
    arrs = {
        i: np.stack(
            [rng.integers(0, 200, size=(12 + i, 10 + i), dtype=np.uint8)] * 3,
            axis=2,
        )
        for i in range(4)
    }
    media = spark.createDataFrame(
        [(i, bytearray(encode_gif(a))) for i, a in arrs.items()],
        "media_id bigint, content binary",
    )
    got = {r["media_id"]: r for r in extract_pixel_features(media).collect()}
    assert set(got) == set(arrs)
    for i, a in arrs.items():
        h, w, _ = a.shape
        assert (got[i]["width"], got[i]["height"]) == (w, h)
        assert got[i]["mean_r"] == int(a[:, :, 0].sum()) / float(h * w)


def test_y4m_roundtrip_all_colorspaces():
    """Encode → decode recovers every plane byte-exactly for 420/422/
    444/mono, and header metadata (dims, fps, frame count) survives."""
    import numpy as np

    from oasysdb_spark.operators import multimodal as mm

    rng = np.random.default_rng(7)
    for cs, (wd, hd) in [("420", (2, 2)), ("422", (2, 1)), ("444", (1, 1))]:
        frames = [
            (
                rng.integers(0, 256, (12, 16), dtype=np.uint8),
                rng.integers(0, 256, (12 // hd, 16 // wd), dtype=np.uint8),
                rng.integers(0, 256, (12 // hd, 16 // wd), dtype=np.uint8),
            )
            for _ in range(3)
        ]
        blob = mm.encode_y4m(frames, fps=(30, 1), colorspace=cs)
        got, meta = mm.decode_y4m(blob)
        assert meta == {
            "width": 16, "height": 12, "fps_num": 30, "fps_den": 1,
            "colorspace": cs, "n_frames": 3,
        }
        for (y, u, v), (gy, gu, gv) in zip(frames, got):
            assert (y == gy).all() and (u == gu).all() and (v == gv).all()
    mono = [(rng.integers(0, 256, (8, 8), dtype=np.uint8), None, None)]
    got, meta = mm.decode_y4m(mm.encode_y4m(mono, colorspace="mono"))
    assert meta["colorspace"] == "mono" and (got[0][0] == mono[0][0]).all()
    assert got[0][1] is None


def test_y4m_corrupt_and_boundary_semantics():
    """Truncated frames and bad framing raise ValueError; unknown
    colorspaces and non-y4m containers hit the documented
    NotImplementedError external-codec boundary."""
    import numpy as np
    import pytest

    from oasysdb_spark.operators import multimodal as mm

    frames = [(np.zeros((8, 8), np.uint8), np.zeros((4, 4), np.uint8),
               np.zeros((4, 4), np.uint8))]
    blob = mm.encode_y4m(frames)
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_y4m(blob[:-5])
    with pytest.raises(ValueError, match="marker"):
        mm.decode_y4m(blob.replace(b"FRAME", b"FRAMX"))
    with pytest.raises(NotImplementedError, match="colorspace"):
        mm.decode_y4m(b"YUV4MPEG2 W8 H8 F25:1 C410\nFRAME\n" + b"\x00" * 96)
    with pytest.raises(ValueError, match="divisible"):
        mm.decode_y4m(b"YUV4MPEG2 W9 H9 F25:1 C420\nFRAME\n" + b"\x00" * 99)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        mm.decode_video(b"\x00\x00\x00\x20ftypisom rest-of-an-mp4")


def test_video_features_match_local_recompute(spark, sf_dir):
    """End-to-end through the real codec: multimodal_video_stats values
    re-derived locally from the document text bytes (luma = padded
    utf-8 payload, chroma constant) — decode, sampling schedule, and
    the exact-integer-sum contract all pinned."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from oasysdb_spark.operators import multimodal as mm

    def r6(x):
        # Spark ROUND on doubles = BigDecimal.valueOf (decimal string
        # repr) + HALF_UP; Python's round() is banker's and diverges on
        # exact .5 boundaries like 47.2578125
        return float(Decimal(str(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    got = {
        r["media_id"]: r
        for r in mm.multimodal_video_stats(spark, sf_dir, every_n=2).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert len(got) == len(docs) > 0
    for d in docs:
        b = d["text"].encode("utf-8")
        nf = max(1, math.ceil(len(b) / 256))
        payload = b + b"\x00" * (nf * 256 - len(b))
        sampled = list(range(0, nf, 2))
        lsum = sum(sum(payload[i * 256 : (i + 1) * 256]) for i in sampled)
        want_mean = r6(lsum / (256.0 * len(sampled)))
        r = got[d["doc_id"]]
        assert r["n_frames"] == nf and r["n_sampled"] == len(sampled)
        assert r["width"] == 16 and r["height"] == 16
        assert r["luma_mean"] == want_mean, d["doc_id"]
        if len(sampled) > 1:
            dsum = 0
            for a, bidx in zip(sampled, sampled[1:]):
                pa = payload[a * 256 : (a + 1) * 256]
                pb = payload[bidx * 256 : (bidx + 1) * 256]
                dsum += sum(abs(x - y) for x, y in zip(pa, pb))
            assert r["motion"] == r6(dsum / (256.0 * (len(sampled) - 1)))
        else:
            assert r["motion"] == 0.0


def test_y4m_header_only_stream_is_corrupt():
    """A stream truncated right after the header must raise a clean
    codec error, not divide-by-zero inside the feature extractor."""
    import pytest

    from oasysdb_spark.operators import multimodal as mm

    with pytest.raises(ValueError, match="no frames"):
        mm.decode_y4m(b"YUV4MPEG2 W16 H16 F25:1 C420\n")


def test_y4m_meta_frames_follow_utf8_octets(spark):
    """meta.n_frames must match the ENCODED stream (utf-8 octet length,
    min one frame) even for multi-byte text and empty docs."""
    import pandas as pd

    from oasysdb_spark.operators import multimodal as mm

    # 200 two-byte chars = 400 octets -> 2 frames (n_chars says 1)
    rows = [(1, "é" * 200, "xx", "t", 200), (2, "", "xx", "t", 0)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    import os
    out = "/tmp/y4m_meta_probe"
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    media = mm.synthesize_y4m_media_from_documents(spark, out)
    got = {r["media_id"]: r for r in media.collect()}
    assert got[1]["meta"]["n_frames"] == 2
    assert got[2]["meta"]["n_frames"] == 1
    for mid, r in got.items():
        _, meta = mm.decode_y4m(bytes(r["content"]))
        assert meta["n_frames"] == r["meta"]["n_frames"], mid
