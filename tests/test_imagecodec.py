"""Pure-stdlib image codecs (r10 — the pixel-decode / frame-sampling
contracts, closed without PIL/ffmpeg): PNG round-trips through every
scanline filter, BMP through both row orders and the palette path, GIF
through LZW including dictionary reset at 4096 entries and interlace;
plus decode of real system images produced by external encoders, and
the Spark operators over decodable synthetic corpora."""

import glob
import os

import numpy as np
import pytest

from renkodf_spark.operators import imagecodec as ic

rng = np.random.RandomState(7)


# ----------------------------------------------------------------- PNG


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(ch):
    # 13 rows -> the per-row filter schedule (y % 5) hits all 5 filters
    arr = rng.randint(0, 256, size=(13, 9, ch), dtype=np.uint8)
    out = ic.decode_png(ic.encode_png(arr if ch > 1 else arr[:, :, 0]))
    assert out.shape == (13, 9, ch)
    np.testing.assert_array_equal(out, arr)


def test_png_palette_expands_to_rgb():
    pal = rng.randint(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.randint(0, 256, size=(10, 7), dtype=np.uint8)
    np.testing.assert_array_equal(
        ic.decode_png(ic.encode_png(idx, palette=pal)), pal[idx]
    )


def test_png_rejects_out_of_scope():
    with pytest.raises(ValueError, match="not a PNG"):
        ic.decode_png(b"nope")
    # Adam7 interlace flag set
    data = bytearray(ic.encode_png(np.zeros((4, 4), dtype=np.uint8)))
    data[8 + 8 + 12] = 1  # IHDR interlace byte
    with pytest.raises(ValueError, match="interlace"):
        ic.decode_png(bytes(data))


# ----------------------------------------------------------------- BMP


@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("w", [5, 8])  # 5 -> padded rows, 8 -> unpadded
def test_bmp_roundtrip(top_down, w):
    arr = rng.randint(0, 256, size=(11, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        ic.decode_bmp(ic.encode_bmp(arr, top_down=top_down)), arr
    )


def test_bmp_rejects_compressed():
    data = bytearray(ic.encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    data[30] = 1  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        ic.decode_bmp(bytes(data))


# ----------------------------------------------------------------- GIF


def test_gif_multiframe_roundtrip_with_delays():
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    frames = [rng.randint(0, 256, size=(40, 60), dtype=np.uint8) for _ in range(3)]
    dec = ic.decode_gif_frames(ic.encode_gif(frames, pal, delays_cs=[5, 10, 15]))
    assert [d["delay_cs"] for d in dec] == [5, 10, 15]
    for f, d in zip(frames, dec):
        np.testing.assert_array_equal(d["pixels"], pal[f])


def test_gif_lzw_dictionary_reset():
    """120x130 random bytes force the LZW dict past 4096 entries — the
    clear-and-rebuild path must round-trip bit-exact."""
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    big = rng.randint(0, 256, size=(120, 130), dtype=np.uint8)
    np.testing.assert_array_equal(
        ic.decode_gif_frames(ic.encode_gif([big], pal))[0]["pixels"], pal[big]
    )


def test_gif_interlace_and_small_palette():
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    fr = rng.randint(0, 256, size=(23, 17), dtype=np.uint8)
    np.testing.assert_array_equal(
        ic.decode_gif_frames(ic.encode_gif([fr], pal, interlace=True))[0]["pixels"],
        pal[fr],
    )
    pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    f4 = rng.randint(0, 4, size=(9, 9), dtype=np.uint8)
    np.testing.assert_array_equal(
        ic.decode_gif_frames(ic.encode_gif([f4], pal4))[0]["pixels"], pal4[f4]
    )


# ------------------------------------------- real-world external bytes


def _cpython_imghdr_dir():
    """CPython's test-suite image fixtures (python.png/jpg/bmp/gif — the
    same 16x16 logo in every format), located generically: the running
    interpreter's stdlib first, then any python install visible on
    common mount roots."""
    import sysconfig

    cands = [os.path.join(sysconfig.get_paths().get("stdlib", ""), "test", "imghdrdata")]
    for pat in (
        "/usr/lib/python3*/test/imghdrdata",
        "/mnt/*/*/*/python/install/lib/python3*/test/imghdrdata",
        "/opt/*/lib/python3*/test/imghdrdata",
    ):
        cands += glob.glob(pat)
    for c in cands:
        if os.path.exists(os.path.join(c, "python.png")):
            return c
    return None



def test_decodes_real_system_images():
    """External-encoder validation: PNGs/GIFs shipped with system
    packages (libpng/giflib-era encoders, not our own) must decode with
    dimensions matching the header parser. Skips if the container has
    none; out-of-scope features (e.g. bit depth 2) must raise
    ValueError, never crash."""
    from renkodf_spark.operators.multimodal import parse_image_header

    paths = (
        glob.glob("/usr/share/gitweb/static/*.png")
        + glob.glob("/usr/share/doc/python3/_static/*.png")
        + glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif")
    )
    if not paths:
        pytest.skip("no system images in this container")
    decoded = 0
    for p in paths:
        data = open(p, "rb").read()
        hdr = parse_image_header(data)
        assert hdr is not None, p
        try:
            px = (
                ic.decode_png(data)
                if hdr[0] == "png"
                else ic.decode_gif_frames(data)[0]["pixels"]
            )
        except ValueError:
            continue  # documented out-of-scope feature
        assert (px.shape[1], px.shape[0]) == (hdr[1], hdr[2]), p
        decoded += 1
    assert decoded >= len(paths) // 2, f"only {decoded}/{len(paths)} decoded"


# ------------------------------------------------------ Spark operators


def test_decode_image_pixels_operator(spark):
    """decode_image_pixels over a decodable synthetic corpus: stats
    match the formula; include_pixels returns the exact flattened
    arrays; JPEG/unknown payloads get status rows, not exceptions."""
    from renkodf_spark.operators import multimodal

    ids = spark.range(30).selectExpr("id AS doc_id")
    media = multimodal.synth_decodable_media(ids)
    rows = {
        r["media_id"]: r
        for r in multimodal.decode_image_pixels(media, include_pixels=True).collect()
    }
    assert len(rows) == 30
    for i, r in rows.items():
        w, h = i % 24 + 1, (i * 7) % 24 + 1
        assert r["status"] == "ok" and (r["width"], r["height"]) == (w, h)
        if i % 3 == 2:  # gif identity-gray palette
            want = np.repeat(ic.formula_pixels(i, w, h, 1), 3, axis=2)
        else:
            want = ic.formula_pixels(i, w, h, 3)
        assert r["pixel_sum"] == int(want.astype("int64").sum())
        np.testing.assert_array_equal(
            np.array(r["pixels"], dtype=np.uint8).reshape(h, w, 3), want
        )

    # a JPEG payload reports unsupported instead of raising
    from renkodf_spark.operators.multimodal import synthetic_media

    jpeg_media = synthetic_media(spark.range(3, 4).selectExpr("id AS doc_id"))
    (jr,) = multimodal.decode_image_pixels(jpeg_media).collect()
    assert jr["format"] == "jpeg" and jr["status"].startswith("unsupported")
    assert jr["pixel_sum"] is None


def test_frame_sample_operator(spark):
    """frame_sample: every_n sampling over multi-frame GIFs with exact
    per-frame delays and pixel sums; non-GIF payloads yield no rows."""
    from renkodf_spark.operators import multimodal

    ids = spark.range(12).selectExpr("id AS doc_id")
    media = multimodal.synth_animated_media(ids)
    out = multimodal.frame_sample(media, every_n=2).collect()
    by_key = {(r["media_id"], r["frame_index"]): r for r in out}
    expect_rows = 0
    for i in range(12):
        n_frames = i % 3 + 2
        w, h = i % 24 + 1, (i * 7) % 24 + 1
        for f in range(0, n_frames, 2):
            expect_rows += 1
            r = by_key[(i, f)]
            assert r["delay_cs"] == (i + f) % 50 + 1
            want = 3 * int(ic.formula_pixels(i + 13 * f, w, h, 1).astype("int64").sum())
            assert r["pixel_sum"] == want and (r["width"], r["height"]) == (w, h)
    assert len(out) == expect_rows

    # non-GIF payloads: zero rows
    png_only = multimodal.synth_decodable_media(
        spark.range(0, 30, 3).selectExpr("id AS doc_id")  # id%3==0 -> all PNG
    )
    assert multimodal.frame_sample(png_only, every_n=1).count() == 0


# ----------------------------------------------------------------- WAV


def test_wav_roundtrip_mono_and_stereo():
    for ch in (1, 2):
        s = ic.formula_samples(123, 1000, ch)
        arr, rate = ic.decode_wav(ic.encode_wav(s, 8000))
        assert rate == 8000 and arr.shape == (1000, ch)
        np.testing.assert_array_equal(arr, s)


def test_wav_skips_unknown_chunks_and_rejects_float():
    s = ic.formula_samples(9, 64, 1)
    data = ic.encode_wav(s, 16000)
    # splice a LIST chunk (odd length -> exercises word alignment)
    import struct as st

    inject = b"LIST" + st.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = data[:12] + inject + data[12:]
    spliced = spliced[:4] + st.pack("<I", len(spliced) - 8) + spliced[8:]
    arr, rate = ic.decode_wav(spliced)
    np.testing.assert_array_equal(arr, s)

    bad = bytearray(data)
    bad[20] = 3  # IEEE float format tag
    with pytest.raises(ValueError, match="unsupported WAV"):
        ic.decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="RIFF"):
        ic.decode_wav(b"nope")


def test_decode_audio_samples_operator(spark):
    from renkodf_spark.operators import multimodal

    ids = spark.range(20).selectExpr("id AS doc_id")
    rows = {
        r["media_id"]: r
        for r in multimodal.decode_audio_samples(
            multimodal.synth_audio_media(ids), include_samples=True
        ).collect()
    }
    for i, r in rows.items():
        n, ch = i % 1200 + 64, i % 2 + 1
        want = ic.formula_samples(i, n, ch)
        assert r["status"] == "ok"
        assert (r["n_samples"], r["channels"]) == (n, ch)
        assert r["sample_rate"] == 8000 + (i % 3) * 4000
        assert r["duration_ms"] == n * 1000 // r["sample_rate"]
        assert r["sample_sum"] == int(want.astype("int64").sum())
        np.testing.assert_array_equal(
            np.array(r["samples"], dtype=np.int16).reshape(n, ch), want
        )
    # non-WAV payload reports status, no exception
    bad = multimodal.documents_as_media(
        spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    )
    (br,) = multimodal.decode_audio_samples(bad).collect()
    assert br["status"].startswith("unsupported") and br["sample_sum"] is None


def test_audio_window_energy_operator(spark):
    from renkodf_spark.operators import multimodal

    ids = spark.range(6).selectExpr("id AS doc_id")
    out = multimodal.audio_window_energy(
        multimodal.synth_audio_media(ids), window=256
    ).collect()
    by_key = {(r["media_id"], r["window_index"]): r for r in out}
    total = 0
    for i in range(6):
        n, ch = i % 1200 + 64, i % 2 + 1
        sq = (ic.formula_samples(i, n, ch).astype("int64") ** 2).sum(axis=1)
        for wi in range(0, n, 256):
            total += 1
            r = by_key[(i, wi // 256)]
            assert r["energy"] == int(sq[wi : wi + 256].sum())
            assert r["n_in_window"] == len(sq[wi : wi + 256])
    assert len(out) == total


# ----------------------------------------------------------------- AVI


def test_avi_roundtrip_and_codec_gate():
    frames = [rng.randint(0, 256, size=(9, 5, 3), dtype=np.uint8) for _ in range(4)]
    dec, us = ic.decode_avi_frames(ic.encode_avi(frames, fps=20))
    assert us == 50_000 and len(dec) == 4
    for a, b in zip(frames, dec):
        np.testing.assert_array_equal(a, b)
    # compressed fourcc -> the documented ffmpeg boundary
    data = bytearray(ic.encode_avi(frames[:1]))
    i = data.find(b"vids")
    data[i + 4 : i + 8] = b"MJPG"
    with pytest.raises(ValueError, match="needs ffmpeg"):
        ic.decode_avi_frames(bytes(data))
    with pytest.raises(ValueError, match="RIFF/AVI"):
        ic.decode_avi_frames(b"RIFFxxxxWAVE")


def test_frame_sample_over_avi(spark):
    """frame_sample walks the AVI container: every_n sampling, the
    container's constant frame duration, exact per-frame pixel sums."""
    from renkodf_spark.operators import multimodal

    ids = spark.range(8).selectExpr("id AS doc_id")
    out = multimodal.frame_sample(
        multimodal.synth_video_media(ids), every_n=2
    ).collect()
    by_key = {(r["media_id"], r["frame_index"]): r for r in out}
    expect = 0
    for i in range(8):
        w, h, fps = i % 24 + 1, (i * 7) % 24 + 1, 10 + i % 4
        for f in range(0, i % 3 + 2, 2):
            expect += 1
            r = by_key[(i, f)]
            assert r["delay_cs"] == (1_000_000 // fps) // 10_000
            want = int(ic.formula_pixels(i + 13 * f, w, h, 3).astype("int64").sum())
            assert r["pixel_sum"] == want and (r["width"], r["height"]) == (w, h)
    assert len(out) == expect


# ---------------------------------------------------------------- JPEG


def test_jpeg_block_constant_grayscale_is_exact():
    """Constant-within-8x8-block grayscale leaves only the integer DC
    coefficient after the DCT, so quant=1 decode is bit-exact — the
    property the oracle-gated gate query stands on."""
    blocks = rng.randint(0, 256, size=(3, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    for dri in (0, 2):
        dec = ic.decode_jpeg(ic.encode_jpeg(img, restart_interval=dri))
        np.testing.assert_array_equal(dec[:, :, 0], img)


def test_jpeg_roundtrip_tolerance_and_restarts():
    g = rng.randint(0, 256, size=(40, 33), dtype=np.uint8)
    for dri in (0, 1, 3):
        dg = ic.decode_jpeg(ic.encode_jpeg(g, restart_interval=dri))[:, :, 0]
        assert np.abs(dg.astype(int) - g.astype(int)).max() <= 2, dri
    c = rng.randint(0, 256, size=(19, 22, 3), dtype=np.uint8)
    dc = ic.decode_jpeg(ic.encode_jpeg(c))
    assert np.abs(dc.astype(int) - c.astype(int)).max() <= 4  # color xform rounding
    # lossy regime still structurally sane
    dl = ic.decode_jpeg(ic.encode_jpeg(c, quant=16))
    assert dl.shape == c.shape and abs(float(dl.mean()) - float(c.mean())) < 8


def test_jpeg_decodes_real_system_files_within_jpeg_loss():
    """Cross-format external validation: the Python-logo JPEG shipped
    with CPython's test data must decode to within normal JPEG loss of
    the SAME image's PNG (decoded by our independent PNG codec) — a
    systematically wrong zigzag/IDCT/Huffman would miss by 10x."""
    base = _cpython_imghdr_dir()
    if base is None:
        pytest.skip("no CPython image test data in this container")
    jpg = ic.decode_jpeg(open(os.path.join(base, "python.jpg"), "rb").read())
    png = ic.decode_png(open(os.path.join(base, "python.png"), "rb").read())[:, :, :3]
    assert jpg.shape == png.shape
    diff = np.abs(jpg.astype(int) - png.astype(int))
    assert float(diff.mean()) < 15, float(diff.mean())


def test_cross_codec_exactness_on_external_files():
    """Two independent decoders (PNG: zlib+filters; BMP: raw V5
    bitfields) must agree bit-for-bit on external encodings of the
    same image."""
    base = _cpython_imghdr_dir()
    if base is None:
        pytest.skip("no CPython image test data in this container")
    png = ic.decode_png(open(os.path.join(base, "python.png"), "rb").read())[:, :, :3]
    bmp = ic.decode_bmp(open(os.path.join(base, "python.bmp"), "rb").read())[:, :, :3]
    np.testing.assert_array_equal(png, bmp)


# --------------------------------------------------- perceptual hashing


def test_image_dhash_and_neardup_pairs(spark):
    """dHash: a lightly-perturbed image stays within a small Hamming
    distance of the original while an inverted image lands far away;
    the integer cross-multiplication definition is replayed exactly in
    numpy here (the gate queries replay it in SQL)."""
    from renkodf_spark.operators import multimodal

    base = ic.formula_pixels(7, 20, 16, 3)
    tweaked = base.copy()
    tweaked[3, 4] = (tweaked[3, 4].astype(int) + 9 % 256).astype(np.uint8)
    inverted = (255 - base.astype(int)).astype(np.uint8)

    rows = [
        (0, "image/png", bytearray(ic.encode_png(base))),
        (1, "image/png", bytearray(ic.encode_png(tweaked))),
        (2, "image/png", bytearray(ic.encode_png(inverted))),
        (3, "image/bmp", bytearray(ic.encode_bmp(base))),  # same pixels, other codec
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    hs = {r["media_id"]: r for r in multimodal.image_dhash(media).collect()}
    assert all(r["status"] == "ok" for r in hs.values())
    # same pixels through two codecs -> identical hash
    assert (hs[0]["dhash_hi"], hs[0]["dhash_lo"]) == (hs[3]["dhash_hi"], hs[3]["dhash_lo"])

    def ham(a, b):
        return bin(a["dhash_hi"] ^ b["dhash_hi"]).count("1") + bin(
            a["dhash_lo"] ^ b["dhash_lo"]
        ).count("1")

    assert ham(hs[0], hs[1]) <= 4
    assert ham(hs[0], hs[2]) >= 20  # inversion flips the gradient bits

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.dhash_hamming_pairs(
            multimodal.image_dhash(media), max_distance=4
        ).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 0
    assert (0, 2) not in pairs


def test_audio_fingerprint_operator(spark):
    """Envelope fingerprint: identical audio through different encodes
    matches; a rescaled copy keeps the envelope SHAPE (same bits); a
    reversed copy diverges."""
    from renkodf_spark.operators import multimodal

    n = 256 * 20
    base = ic.formula_samples(3, n, 1)
    # amplitude halved: every energy scales by ~1/4 -> delta SIGNS keep
    half = (base // 2).astype(np.int16)
    rev = base[::-1].copy()
    rows = [
        (0, "audio/wav", bytearray(ic.encode_wav(base))),
        (1, "audio/wav", bytearray(ic.encode_wav(base, 8000))),  # rate-only change
        (2, "audio/wav", bytearray(ic.encode_wav(half))),
        (3, "audio/wav", bytearray(ic.encode_wav(rev))),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    fp = {r["media_id"]: r for r in multimodal.audio_fingerprint(media).collect()}
    assert all(r["status"] == "ok" for r in fp.values())
    assert (fp[0]["fp_hi"], fp[0]["fp_lo"]) == (fp[1]["fp_hi"], fp[1]["fp_lo"])

    def ham(a, b):
        return bin(a["fp_hi"] ^ b["fp_hi"]).count("1") + bin(
            a["fp_lo"] ^ b["fp_lo"]
        ).count("1")

    assert ham(fp[0], fp[2]) <= 6  # scale-robust (integer halving jitters ties)
    assert ham(fp[0], fp[3]) >= 8  # reversal flips the envelope

# --------------------------------------- banded Hamming pairs (r11)


def test_hash64_band_exprs_reassemble_and_straddle(spark):
    """The band-extraction expressions slice the conceptual 64-bit word
    (hi = bits 0-31, lo = bits 32-63) exactly: for adversarial hash
    values the Spark-evaluated band keys equal a pure-Python replay,
    including bands straddling the hi/lo boundary, and OR-ing the
    shifted bands back together reassembles both halves bit-for-bit."""
    from renkodf_spark.operators.multimodal import _hash64_band_exprs

    vals = [
        (0, 0),
        (0xFFFFFFFF, 0xFFFFFFFF),
        (0x80000001, 0x7FFFFFFE),
        (0x12345678, 0x9ABCDEF0),
        (1, 0),
        (0, 1),
        (0xDEADBEEF, 0x0BADF00D),
    ]
    df = spark.createDataFrame(
        [(i, hi, lo) for i, (hi, lo) in enumerate(vals)], "i long, hi long, lo long"
    )
    for num_bands in (1, 2, 3, 7, 11, 64):
        base, extra = divmod(64, num_bands)
        widths = [base + (1 if b < extra else 0) for b in range(num_bands)]
        exprs = _hash64_band_exprs("hi", "lo", num_bands)
        got = df.select("i", *[e.alias(f"b{b}") for b, e in exprs]).collect()
        for row in got:
            hi, lo = vals[row["i"]]
            word = hi | (lo << 32)
            start = 0
            for b, w in enumerate(widths):
                expect = (word >> start) & ((1 << w) - 1)
                if expect >= 1 << 63:  # the single-64-bit-band case is
                    expect -= 1 << 64  # a signed BIGINT (still a bijection)
                assert row[f"b{b}"] == expect, (num_bands, b, hex(word))
                start += w


def test_dhash_banded_parity_and_plan(spark):
    """The r11 banded near-dup path: identical pairs to the all-pairs
    twin at several distances (pigeonhole recall is EXACT, not
    approximate), and the executed plan contains no
    BroadcastNestedLoopJoin / CartesianProduct — the scale fix the r10
    verdict asked for."""
    from renkodf_spark.operators import multimodal

    ids = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    hashes = multimodal.image_dhash(multimodal.synth_decodable_media(ids)).cache()
    try:
        for d in (0, 2, 10):
            banded = multimodal.dhash_hamming_pairs(hashes, max_distance=d)
            allp = multimodal.dhash_hamming_pairs(hashes, max_distance=d, banded=False)
            assert sorted(map(tuple, banded.collect())) == sorted(
                map(tuple, allp.collect())
            )
        plan = banded._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
    finally:
        hashes.unpersist()


def test_dhash_banded_works_on_audio_fingerprint_columns(spark):
    """The banded path keeps audio_fingerprint's renamed-halves reuse:
    fp_hi/fp_lo route through the same band table via the column
    parameters, parity with all-pairs."""
    from renkodf_spark.operators import multimodal

    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    fp = multimodal.audio_fingerprint(multimodal.synth_audio_media(ids)).cache()
    try:
        kw = dict(max_distance=4, hi_col="fp_hi", lo_col="fp_lo")
        banded = multimodal.dhash_hamming_pairs(fp, **kw)
        allp = multimodal.dhash_hamming_pairs(fp, banded=False, **kw)
        assert sorted(map(tuple, banded.collect())) == sorted(map(tuple, allp.collect()))
    finally:
        fp.unpersist()


def test_dhash_banded_rejects_out_of_range_distance(spark):
    from renkodf_spark.operators import multimodal

    ids = spark.range(0, 4).withColumnRenamed("id", "doc_id")
    hashes = multimodal.image_dhash(multimodal.synth_decodable_media(ids))
    for bad in (-1, 64, 100):
        with pytest.raises(ValueError):
            multimodal.dhash_band_table(hashes, max_distance=bad)


def test_frame_sample_avi_sniff_gated_on_declared_type(spark):
    """ADVICE r10: the RIFF/AVI magic is only consulted for payloads
    declared video/*, application/octet-stream, or untyped — an AVI
    byte-stream declared text/plain must NOT decode as video, matching
    the image-side _should_sniff contract."""
    from renkodf_spark.operators import multimodal

    frames = [ic.formula_pixels(5 + 13 * f, 6, 4, 3) for f in range(3)]
    avi = bytearray(ic.encode_avi(frames, fps=10))
    rows = [
        (0, "video/x-msvideo", avi),
        (1, None, avi),
        (2, "application/octet-stream", avi),
        (3, "text/plain", avi),  # declared non-video: never sniffed
        (4, "image/fake", avi),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.frame_sample(media, every_n=1).groupBy("media_id").count().collect()
    counts = {r["media_id"]: r["count"] for r in got}
    assert counts.get(0) == 3 and counts.get(1) == 3 and counts.get(2) == 3
    assert 3 not in counts and 4 not in counts


def test_frame_dhash_matches_image_dhash_kernel(spark):
    """r11: the video leg shares the dHash kernel — a one-frame AVI's
    frame hash equals image_dhash of the same pixels encoded as PNG;
    sampling and the declared-type gate behave like frame_sample."""
    from renkodf_spark.operators import multimodal

    px = ic.formula_pixels(9, 16, 12, 3)
    avi = bytearray(ic.encode_avi([px], fps=10))
    png = bytearray(ic.encode_png(px))
    media = spark.createDataFrame(
        [
            (0, "video/x-msvideo", avi),
            (1, "image/png", png),
            (2, "text/plain", avi),  # declared non-video: gated out
        ],
        multimodal.MEDIA_SCHEMA,
    )
    fh = {r["media_id"]: r for r in multimodal.frame_dhash(media).collect()}
    ih = {r["media_id"]: r for r in multimodal.image_dhash(media).collect()}
    assert 0 in fh and fh[0]["frame_index"] == 0
    assert (fh[0]["dhash_hi"], fh[0]["dhash_lo"]) == (ih[1]["dhash_hi"], ih[1]["dhash_lo"])
    assert 2 not in fh  # _should_sniff_video gate inherited

    # every_n sampling over a multi-frame AVI
    frames = [ic.formula_pixels(9 + 13 * f, 8, 6, 3) for f in range(4)]
    m2 = spark.createDataFrame(
        [(7, "video/x-msvideo", bytearray(ic.encode_avi(frames, fps=10)))],
        multimodal.MEDIA_SCHEMA,
    )
    got = sorted(r["frame_index"] for r in multimodal.frame_dhash(m2, every_n=2).collect())
    assert got == [0, 2]


def test_dhash_band_table_composes_with_incremental_lsh(spark):
    """The production increment shape for perceptual dedup (r11):
    dhash_band_table emits the same (id, band, key) relation as the
    text LSH band index, so dedup.incremental_lsh_pairs works on it
    unchanged — candidates from new-vs-baseline + new-vs-new band
    equi-joins, verified with xor/bit_count, equal the full banded
    pair stage restricted to pairs touching the increment."""
    from renkodf_spark.operators import dedup, multimodal

    d = 4
    base_ids = spark.range(0, 80).withColumnRenamed("id", "doc_id")
    new_ids = spark.range(80, 120).withColumnRenamed("id", "doc_id")
    hb = multimodal.image_dhash(multimodal.synth_decodable_media(base_ids)).cache()
    hn = multimodal.image_dhash(multimodal.synth_decodable_media(new_ids)).cache()
    try:
        bb = multimodal.dhash_band_table(hb, max_distance=d)
        nb = multimodal.dhash_band_table(hn, max_distance=d)
        cand = dedup.incremental_lsh_pairs(nb, bb)
        allh = hb.unionByName(hn)
        import pyspark.sql.functions as F

        verified = (
            cand.join(
                allh.select(
                    F.col("media_id").alias("id_a"),
                    F.col("dhash_hi").alias("hi_a"),
                    F.col("dhash_lo").alias("lo_a"),
                ),
                "id_a",
            )
            .join(
                allh.select(
                    F.col("media_id").alias("id_b"),
                    F.col("dhash_hi").alias("hi_b"),
                    F.col("dhash_lo").alias("lo_b"),
                ),
                "id_b",
            )
            .withColumn(
                "hamming",
                F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
                + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))),
            )
            .filter(F.col("hamming") <= d)
            .select("id_a", "id_b", "hamming")
        )
        got = sorted(map(tuple, verified.collect()))
        full = multimodal.dhash_hamming_pairs(allh, max_distance=d)
        want = sorted(
            t for t in map(tuple, full.collect()) if t[0] >= 80 or t[1] >= 80
        )
        assert got and got == want
    finally:
        hb.unpersist()
        hn.unpersist()


def test_box_resize_regimes():
    """_box_resize (r12): exact floor-mean partition when
    downsampling, single-pixel replication when upsampling, mixed
    regimes per axis, and channel independence."""
    import numpy as np

    from renkodf_spark.operators.multimodal import _box_resize

    # downsample 4x4 -> 2x2: each cell = floor-mean of a 2x2 block
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = _box_resize(px, 2, 2)
    assert out[:, :, 0].tolist() == [[(0 + 1 + 4 + 5) // 4, (2 + 3 + 6 + 7) // 4],
                                     [(8 + 9 + 12 + 13) // 4, (10 + 11 + 14 + 15) // 4]]

    # upsample 1x1 -> 3x3: pure replication
    one = np.full((1, 1, 2), 7, dtype=np.uint8)
    up = _box_resize(one, 3, 3)
    assert (up == 7).all() and up.shape == (3, 3, 2)

    # mixed: 1 wide x 4 tall -> 2x2 (replicate x, partition y)
    col = np.array([[10], [20], [30], [40]], dtype=np.uint8)[:, :, None]
    mix = _box_resize(col, 2, 2)
    assert mix[:, :, 0].tolist() == [[15, 15], [35, 35]]

    # channels independent
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[:, :, 1] = 100
    r = _box_resize(rgb, 1, 1)
    assert r[0, 0].tolist() == [0, 100, 0]


def test_resize_real_system_images(spark):
    """resize_image over real externally-encoded files (same corpus as
    the decode validation): every decodable image yields exactly
    out_h*out_w*ch rows of in-range values, and a constant-color image
    resizes to that constant in both regimes."""
    import glob

    import numpy as np

    from renkodf_spark.operators import imagecodec as ic
    from renkodf_spark.operators.multimodal import resize_image

    paths = (
        glob.glob("/usr/share/gitweb/static/*.png")
        + glob.glob("/usr/share/doc/python3/_static/*.png")
    )[:4]
    rows = []
    for i, p in enumerate(paths):
        with open(p, "rb") as f:
            rows.append((i, "image/png", bytearray(f.read())))
    # plus synthetic constants exercising both regimes vs the 6x5 target
    rows.append((100, "image/png", bytearray(ic.encode_png(np.full((2, 3, 3), 77, np.uint8)))))
    rows.append((101, "image/png", bytearray(ic.encode_png(np.full((20, 17, 3), 130, np.uint8)))))
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    out = resize_image(media, out_w=6, out_h=5).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, rs in by_id.items():
        ok = [r for r in rs if r.status == "ok"]
        if not ok:
            continue  # out-of-scope depth etc: per-row status contract
        ch = len({r.c for r in ok})
        assert len(ok) == 5 * 6 * ch, (mid, len(ok), ch)
        assert all(0 <= r.v <= 255 for r in ok)
    assert all(r.v == 77 for r in by_id[100]) and len(by_id[100]) == 90
    assert all(r.v == 130 for r in by_id[101]) and len(by_id[101]) == 90
