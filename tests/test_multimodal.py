"""Multimodal blob plumbing: schemas, determinism, batch shapes."""

from __future__ import annotations

import pytest

import hashlib

from pyspark.sql import Row

from mapreduce_system_spark.operators import multimodal as MM


def blobs(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="hello world"), Row(doc_id=2, text="xyz")]
    )
    return MM.binarize_text(df)


def test_binarize_schema_and_bytes(spark):
    got = {r.id: (bytes(r.blob), r.content_type, r.n_bytes) for r in blobs(spark).collect()}
    assert got[1] == (b"hello world", "text/plain", 11)
    assert got[2] == (b"xyz", "text/plain", 3)


def test_blob_features_md5_matches_hashlib(spark):
    got = {r.id: (r.n_bytes, r.md5) for r in MM.blob_features(blobs(spark)).collect()}
    assert got[1] == (11, hashlib.md5(b"hello world").hexdigest())
    assert got[2] == (3, hashlib.md5(b"xyz").hexdigest())


def test_image_features_deterministic_fake(spark):
    got = {r.id: r for r in MM.extract_image_features(blobs(spark)).collect()}
    r = got[2]
    assert (r.width, r.height, r.decoder) == (16, 16, "fake")
    assert abs(r.mean_value - (ord("x") + ord("y") + ord("z")) / 3) < 1e-9
    # determinism: second run bit-identical
    again = {r.id: r.mean_value for r in MM.extract_image_features(blobs(spark)).collect()}
    assert again[2] == r.mean_value


def test_sample_frames_explode_shape(spark):
    frames = MM.sample_frames(blobs(spark), n_frames=4).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r.id, []).append((r.frame_idx, bytes(r.frame)))
    # 11-byte blob → 4 contiguous evenly-spaced spans covering the WHOLE
    # blob (no dropped tail): [0:2],[2:5],[5:8],[8:11]
    f1 = sorted(by_id[1])
    assert [i for i, _ in f1] == [0, 1, 2, 3]
    assert b"".join(c for _, c in f1) == b"hello world"
    # 3-byte blob, 4 frames → one span is empty and skipped; the rest
    # still cover every byte exactly once
    f2 = sorted(by_id[2])
    assert len(f2) == 3
    assert b"".join(c for _, c in f2) == b"xyz"


def test_resize_fixed_grid(spark):
    out = {r.id: r for r in MM.resize_image(blobs(spark), width=8, height=8).collect()}
    assert all(len(bytes(r.pixels)) == 64 for r in out.values())
    # determinism
    again = {r.id: bytes(r.pixels) for r in MM.resize_image(blobs(spark), 8, 8).collect()}
    assert again[1] == bytes(out[1].pixels)


def test_image_decoder_adapter_seam(spark):
    """Contract for the real-codec injection point: ANY bytes -> (w, h,
    mean, name) callable drops into extract_image_features with the same
    output schema and the same physical plan — only the decoded values
    change. This is what 'a real codec slots in with zero engine changes'
    means, stated as a test."""

    def fake_real_codec(b: bytes):
        # stands in for PIL: pretend every blob decodes to a 4×2 image
        # whose mean intensity is the first byte
        if not b:
            return None
        return (4, 2, float(b[0]), "custom")

    default = MM.extract_image_features(blobs(spark))
    injected = MM.extract_image_features(blobs(spark), decoder=fake_real_codec)
    # schema identical, plan shape identical (one mapInPandas over the scan)
    assert default.schema == injected.schema
    assert ("mapInPandas" in injected._jdf.queryExecution().executedPlan().toString()
            or "MapInPandas" in injected._jdf.queryExecution().executedPlan().toString())
    got = {r.id: r for r in injected.collect()}
    assert (got[1].width, got[1].height, got[1].decoder) == (4, 2, "custom")
    assert got[1].mean_value == float(ord("h"))
    # a decoder that declines (returns None) falls back to the stand-in
    declined = {r.id: r for r in
                MM.extract_image_features(blobs(spark), decoder=lambda b: None).collect()}
    assert declined[1].decoder == "fake"


def test_audio_features_rms(spark):
    out = {r.id: r for r in MM.extract_audio_features(blobs(spark)).collect()}
    r = out[2]  # b"xyz" → uint8 [120,121,122] - 128 → [-8,-7,-6]
    assert r.n_samples == 3
    assert abs(r.duration_s - 3 / 16000) < 1e-12
    assert abs(r.rms - (((8**2 + 7**2 + 6**2) / 3) ** 0.5)) < 1e-9


def _wav_bytes(samples, rate=8000, width=2, channels=1):
    """Real RIFF WAV container built with the stdlib writer."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_audio_wave_real_codec_through_seam(spark):
    """REAL codec through the adapter seam (not a stand-in): stdlib wave
    decodes actual RIFF/PCM containers inside the same mapInPandas plan.
    Known 16-bit signals verify n_samples/duration/rms exactly; a non-WAV
    blob in the same batch falls back to the stand-in instead of failing
    the stage; schema and plan are identical to the default path."""
    from pyspark.sql import Row

    sig_a = [1000, -1000, 1000, -1000]  # rms = 1000
    sig_b = [0, 0, 0, 0, 0, 0, 0, 0]  # rms = 0
    df = spark.createDataFrame(
        [
            Row(id=1, blob=bytearray(_wav_bytes(sig_a, rate=8000))),
            Row(id=2, blob=bytearray(_wav_bytes(sig_b, rate=4000))),
            Row(id=3, blob=bytearray(b"not a wav at all")),
        ]
    )
    default = MM.extract_audio_features(blobs(spark))
    out = MM.extract_audio_features(df, decoder=MM.decode_audio_wave)
    assert default.schema == out.schema
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan
    got = {r.id: r for r in out.collect()}
    assert (got[1].n_samples, got[1].decoder) == (4, "wave")
    assert abs(got[1].duration_s - 4 / 8000) < 1e-12
    assert abs(got[1].rms - 1000.0) < 1e-9
    assert (got[2].n_samples, got[2].rms, got[2].decoder) == (8, 0.0, "wave")
    assert abs(got[2].duration_s - 8 / 4000) < 1e-12
    assert got[3].decoder == "fake"  # graceful per-blob fallback

    # stereo mixdown: per-frame channel mean, frames counted once
    stereo = _wav_bytes([700, 300, -700, -300], rate=8000, channels=2)
    sout = MM.extract_audio_features(
        spark.createDataFrame([Row(id=9, blob=bytearray(stereo))]),
        decoder=MM.decode_audio_wave,
    ).collect()[0]
    # frames: (700,300) → 500, (-700,-300) → -500 ⇒ rms 500
    assert (sout.n_samples, sout.decoder) == (2, "wave")
    assert abs(sout.rms - 500.0) < 1e-9


def _encode_png(width, height, rows, color_type=2, filters=None):
    """Minimal in-test PNG encoder: applies the FORWARD scanline filter
    per row (the inverse of what decode_image_png reconstructs), so the
    round-trip exercises every filter type, not just None."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = width * channels

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", zlib.crc32(typ + data))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = bytes(stride)
    for y, row in enumerate(rows):
        assert len(row) == stride
        f = (filters or [0] * height)[y]
        filt = bytearray(row)
        if f == 1:  # Sub
            for i in range(stride - 1, channels - 1, -1):
                filt[i] = (filt[i] - row[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                filt[i] = (filt[i] - prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                filt[i] = (filt[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = (filt[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(filt)
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _luma_mean(rows, channels):
    total, n = 0, 0
    for row in rows:
        for i in range(0, len(row), channels):
            if channels >= 3:
                total += (299 * row[i] + 587 * row[i + 1] + 114 * row[i + 2]) // 1000
            else:
                total += row[i]
            n += 1
    return total / n


def test_png_decode_known_pixels():
    """2x2 RGB, filter None: decoded dims and ITU-R 601-2 luma mean."""
    rows = [bytes([255, 0, 0, 0, 255, 0]), bytes([0, 0, 255, 255, 255, 255])]
    got = MM.decode_image_png(_encode_png(2, 2, rows))
    assert got is not None
    w, h, mean, name = got
    assert (w, h, name) == (2, 2, "png")
    assert mean == _luma_mean(rows, 3)


def test_png_decode_all_filter_types_roundtrip():
    """A 5-row gradient image encoded once per filter type (and once with
    a mixed per-row schedule) must always decode to the same luma mean —
    Sub/Up/Average/Paeth reconstruction is exact."""
    w, h = 7, 5
    rows = [bytes(((x * 37 + y * 91 + c * 13) % 256) for x in range(w) for c in range(3))
            for y in range(h)]
    want = _luma_mean(rows, 3)
    for schedule in ([0] * h, [1] * h, [2] * h, [3] * h, [4] * h, [0, 1, 2, 3, 4]):
        got = MM.decode_image_png(_encode_png(w, h, rows, filters=schedule))
        assert got is not None, schedule
        assert (got[0], got[1], got[3]) == (w, h, "png")
        assert got[2] == want, schedule


def test_png_decode_gray_and_alpha_and_rejects():
    gray = [bytes([10, 200]), bytes([30, 40])]
    g = MM.decode_image_png(_encode_png(2, 2, gray, color_type=0))
    assert g == (2, 2, (10 + 200 + 30 + 40) / 4, "png")
    rgba = [bytes([255, 0, 0, 7, 0, 255, 0, 9])]  # alpha ignored
    a = MM.decode_image_png(_encode_png(2, 1, rgba, color_type=6))
    assert a is not None and a[2] == _luma_mean([bytes([255, 0, 0, 0, 255, 0])], 3)
    assert MM.decode_image_png(b"not a png at all") is None
    assert MM.decode_image_png(_encode_png(2, 2, gray, color_type=0)[:20]) is None


def test_png_real_codec_through_seam(spark):
    """The registered mm_image_features plan with the REAL stdlib PNG
    codec through the decoder seam: PNG blobs decode for real ('png'),
    non-PNG blobs fall back per blob ('fake') — same schema, same plan.
    The default chain (decoder=None) must pick the PNG up too."""
    rows = [bytes([0, 0, 0, 255, 255, 255]), bytes([128, 128, 128, 64, 64, 64])]
    png = _encode_png(2, 2, rows)
    df = spark.createDataFrame(
        [Row(id=1, blob=bytearray(png)), Row(id=2, blob=bytearray(b"plain text bytes"))],
        "id long, blob binary",
    )
    for dec in (MM.decode_image_png, None):
        got = {r.id: r for r in MM.extract_image_features(df, decoder=dec).collect()}
        assert (got[1].width, got[1].height, got[1].decoder) == (2, 2, "png")
        assert got[1].mean_value == _luma_mean(rows, 3)
        assert (got[2].width, got[2].height, got[2].decoder) == (16, 16, "fake")


def test_png_decode_rejects_16bit_and_interlaced_per_blob():
    """decode_image_png must return None (→ per-blob stand-in fallback)
    for 16-bit-depth and Adam7-interlaced PNGs rather than raising or
    mis-decoding; the identical image at 8-bit/non-interlaced decodes,
    pinning the rejection to the header flag itself (VERDICT r6 #8)."""
    import struct
    import zlib

    rows = [bytes([10, 20, 30, 40, 50, 60]), bytes([70, 80, 90, 100, 110, 120])]
    good = _encode_png(2, 2, rows)
    assert MM.decode_image_png(good) is not None  # control

    def rewrite_ihdr(png, bit_depth=8, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, bit_depth, 2, 0, 0, interlace)
        chunk = (
            struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )
        return png[:8] + chunk + png[8 + 25:]  # IHDR chunk = 4+4+13+4 bytes

    assert MM.decode_image_png(rewrite_ihdr(good, bit_depth=16)) is None
    assert MM.decode_image_png(rewrite_ihdr(good, interlace=1)) is None
    # and the adapter chain turns that None into the deterministic
    # stand-in instead of dropping or failing the row
    assert MM._default_image_decoder(rewrite_ihdr(good, bit_depth=16)) is None


# ---------------------------------------------------------------------------
# decode_image_jpeg_dc — hand-assembled minimal baseline JPEGs (no imaging
# library exists in this container, so the fixtures are built marker by
# marker; every expected mean is computed from the DC math by hand).
# ---------------------------------------------------------------------------


def _dqt(q: int) -> bytes:
    return b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([q] * 64)


def _sof0(w: int, h: int, comps: list[tuple[int, int]]) -> bytes:
    # comps: [(component_id, HV byte)], all on quant table 0
    body = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for cid, hv in comps:
        body += bytes([cid, hv, 0])
    return b"\xff\xc0" + (2 + len(body)).to_bytes(2, "big") + body


def _dht(tc: int, th: int, sym: int) -> bytes:
    # one code of length 1 ("0") mapping to `sym`
    body = bytes([(tc << 4) | th]) + bytes([1] + [0] * 15) + bytes([sym])
    return b"\xff\xc4" + (2 + len(body)).to_bytes(2, "big") + body


def _sos(comp_ids: list[int]) -> bytes:
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])
    body += bytes([0, 63, 0])
    return b"\xff\xda" + (2 + len(body)).to_bytes(2, "big") + body


def test_jpeg_dc_decodes_minimal_grayscale():
    """8x8 grayscale, q0=8, one block with DC diff 8 (category 4, bits
    1000) then EOB: block mean = 8*8/8 + 128 = 136."""
    from mapreduce_system_spark.operators.multimodal import decode_image_jpeg_dc

    blob = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(8, 8, [(1, 0x11)])
        + _dht(0, 0, 0x04)  # DC: category 4
        + _dht(1, 0, 0x00)  # AC: EOB
        + _sos([1])
        + bytes([0b01000011])  # 0 | 1000 | 0 | pad 11
        + b"\xff\xd9"
    )
    assert decode_image_jpeg_dc(blob) == (8, 8, 136.0, "jpeg-dc")


def test_jpeg_dc_tracks_dc_prediction_across_blocks():
    """16x8 grayscale, two MCUs: diffs +8 then -8 (DC prediction back to
    0): block means 136 and 128 average to 132."""
    from mapreduce_system_spark.operators.multimodal import decode_image_jpeg_dc

    # bits: [0|1000|0] [0|0111|0] = 010000 001110 + pad -> 0x40 0xEF
    blob = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(16, 8, [(1, 0x11)])
        + _dht(0, 0, 0x04)
        + _dht(1, 0, 0x00)
        + _sos([1])
        + bytes([0x40, 0xEF])
        + b"\xff\xd9"
    )
    assert decode_image_jpeg_dc(blob) == (16, 8, 132.0, "jpeg-dc")


def test_jpeg_dc_handles_420_color_mcu():
    """16x16 YCbCr 4:2:0: one MCU of 4 luma + 2 chroma blocks, all DC
    diffs 0 (category 0, no bits): flat mid-gray, mean 128."""
    from mapreduce_system_spark.operators.multimodal import decode_image_jpeg_dc

    blob = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(16, 16, [(1, 0x22), (2, 0x11), (3, 0x11)])
        + _dht(0, 0, 0x00)  # DC: category 0 (diff = 0)
        + _dht(1, 0, 0x00)  # AC: EOB
        + _sos([1, 2, 3])
        + bytes([0x00, 0x0F])  # 12 zero bits + pad
        + b"\xff\xd9"
    )
    assert decode_image_jpeg_dc(blob) == (16, 16, 128.0, "jpeg-dc")


def test_jpeg_dc_rejects_out_of_scope_streams():
    from mapreduce_system_spark.operators.multimodal import decode_image_jpeg_dc

    progressive = (
        b"\xff\xd8"
        + _dqt(8)
        + (b"\xff\xc2" + _sof0(8, 8, [(1, 0x11)])[4:])  # SOF2 body
    )
    assert decode_image_jpeg_dc(progressive) is None
    assert decode_image_jpeg_dc(b"\xff\xd8\xff") is None
    assert decode_image_jpeg_dc(b"not a jpeg") is None
    truncated = b"\xff\xd8" + _dqt(8) + _sof0(8, 8, [(1, 0x11)])
    assert decode_image_jpeg_dc(truncated) is None
    # 12-bit extended-sequential (SOF1, precision byte 12): legal per
    # T.81, but 8-bit level-shift/clamp math would decode it to garbage
    # SILENTLY — must fall back, not return wrong features
    sof12 = _sof0(8, 8, [(1, 0x11)])
    sof12 = b"\xff\xc1" + sof12[2:4] + bytes([12]) + sof12[5:]
    twelve_bit = b"\xff\xd8" + _dqt(8) + sof12 + _dht(0, 0, 0) + _sos([1]) + b"\xff\xd9"
    assert decode_image_jpeg_dc(twelve_bit) is None
    # non-interleaved stream (one SOS per component): the interleaved
    # MCU geometry would scramble the plane, and on MCU-aligned sizes
    # the block count coincides so no error would fire — must fall back
    multi_sos = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(16, 16, [(1, 0x22), (2, 0x11), (3, 0x11)])
        + _dht(0, 0, 0)
        + _sos([1])
        + b"\xff\xd9"
    )
    assert decode_image_jpeg_dc(multi_sos) is None
    from mapreduce_system_spark.operators.multimodal import decode_image_jpeg_pixels

    assert decode_image_jpeg_pixels(twelve_bit) is None
    assert decode_image_jpeg_pixels(multi_sos) is None


def test_default_chain_routes_png_jpeg_and_fake_per_blob(spark):
    """Mixed corpus through the seam with the default chain: each blob
    picks its own real decoder (png / jpeg-dc) and unknown bytes fall to
    the deterministic stand-in — per blob, never per stage (the scope
    contract of VERDICT r7 #8: PNG + WAV + baseline-JPEG-DC are the
    REAL in-container codecs; PIL remains the optional full-decode
    path behind the same seam)."""
    rows = [bytes([0, 0, 0, 255, 255, 255]), bytes([128, 128, 128, 64, 64, 64])]
    png = _encode_png(2, 2, rows)
    jpeg = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(8, 8, [(1, 0x11)])
        + _dht(0, 0, 0x04)
        + _dht(1, 0, 0x00)
        + _sos([1])
        + bytes([0b01000011])
        + b"\xff\xd9"
    )
    df = spark.createDataFrame(
        [
            Row(id=1, blob=bytearray(png)),
            Row(id=2, blob=bytearray(jpeg)),
            Row(id=3, blob=bytearray(b"plain text bytes")),
        ],
        "id long, blob binary",
    )
    got = {r.id: r for r in MM.extract_image_features(df).collect()}
    assert got[1].decoder == "png"
    assert (got[2].width, got[2].height, got[2].mean_value, got[2].decoder) == (
        8, 8, 136.0, "jpeg-dc",
    )
    assert got[3].decoder == "fake"


# ---------------------------------------------------------------------------
# decode_image_jpeg_pixels — full reconstruction (dequant + inverse zigzag
# + IDCT + level shift); fixtures hand-assembled like the DC family, with
# expected pixels derived from the textbook IDCT formula written
# independently here (not the module's basis matrix).
# ---------------------------------------------------------------------------


def _dht_multi(tc: int, th: int, counts16: list[int], syms: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(counts16) + bytes(syms)
    return b"\xff\xc4" + (2 + len(body)).to_bytes(2, "big") + body


def _bits(s: str) -> bytes:
    """Pack a bit string into bytes, 1-padded (JPEG pad convention)."""
    s = s.replace(" ", "")
    s += "1" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _ref_idct(coef_raster):
    """Independent 8x8 IDCT straight from the T.81 formula."""
    import math

    out = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * coef_raster[u][v]
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            out[y][x] = acc / 4.0 + 128.0
    return out


def test_jpeg_pixels_dc_only_block_is_flat():
    """DC-only block: every pixel equals DC*q/8 + 128 exactly (the IDCT
    of a DC-only block is uniform) — the fixture from the DC test."""
    blob = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(8, 8, [(1, 0x11)])
        + _dht(0, 0, 0x04)
        + _dht(1, 0, 0x00)
        + _sos([1])
        + bytes([0b01000011])
        + b"\xff\xd9"
    )
    got = MM.decode_image_jpeg_pixels(blob)
    assert got is not None
    w, h, plane, name = got
    assert (w, h, name) == (8, 8, "jpeg")
    assert plane.shape == (8, 8)
    assert (plane == 136).all()


def test_jpeg_pixels_ac_coefficient_matches_reference_idct():
    """One AC coefficient (zigzag k=1 → F[0][1]): the decoded plane must
    match the textbook IDCT within rounding. DC table: single code '0'
    → category 0; AC table: canonical 2-bit codes 00→0x01 (run 0 size
    1), 01→0x00 (EOB). Stream per block: DC '0', AC '00'+value bit '1'
    (+1), EOB '01'."""
    import numpy as np

    blob = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(8, 8, [(1, 0x11)])
        + _dht(0, 0, 0x00)  # DC: category 0, diff = 0
        + _dht_multi(1, 0, [0, 2] + [0] * 14, [0x01, 0x00])
        + _sos([1])
        + _bits("0 00 1 01")
        + b"\xff\xd9"
    )
    got = MM.decode_image_jpeg_pixels(blob)
    assert got is not None
    _w, _h, plane, _ = got
    coef = [[0.0] * 8 for _ in range(8)]
    coef[0][1] = 1 * 8  # value +1 dequantized by q=8
    want = _ref_idct(coef)
    for y in range(8):
        for x in range(8):
            assert abs(int(plane[y][x]) - want[y][x]) <= 0.5 + 1e-9, (y, x)
    # and the plane mean agrees with the DC triage decoder's mean (the
    # AC term integrates to ~0 over the block)
    dc = MM.decode_image_jpeg_dc(blob)
    assert abs(float(np.mean(plane)) - dc[2]) < 1.0


def test_jpeg_pixels_four_blocks_resize_roundtrip(spark):
    """16x16 grayscale JPEG of four flat 8x8 blocks (means 136/128/144/
    120) through the REAL registered resize plan at 2x2: each grid cell
    is exactly its block mean, and extract_image_features' DC mean is
    exactly the four-block average — VERDICT r8 #5's round-trip pin."""
    # DC table: 2-bit canonical codes 00→cat4, 01→cat5; AC: EOB only.
    # diffs: +8 ('00'+'1000'), -8 ('00'+'0111'), +16 ('01'+'10000'),
    # -24 ('01'+'00111') — predictions 8, 0, 16, -8 = means 136/128/144/120.
    blob = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(16, 16, [(1, 0x11)])
        + _dht_multi(0, 0, [0, 2] + [0] * 14, [0x04, 0x05])
        + _dht(1, 0, 0x00)
        + _sos([1])
        + _bits("00 1000 0  00 0111 0  01 10000 0  01 00111 0")
        + b"\xff\xd9"
    )
    got = MM.decode_image_jpeg_pixels(blob)
    assert got is not None
    _w, _h, plane, _ = got
    assert plane.shape == (16, 16)
    assert (plane[:8, :8] == 136).all() and (plane[:8, 8:] == 128).all()
    assert (plane[8:, :8] == 144).all() and (plane[8:, 8:] == 120).all()

    df = spark.createDataFrame(
        [Row(id=1, blob=bytearray(blob)), Row(id=2, blob=bytearray(b"text"))],
        "id long, blob binary",
    )
    rz = {r.id: r for r in MM.resize_image(df, width=2, height=2).collect()}
    assert rz[1].decoder == "jpeg"
    assert bytes(rz[1].pixels) == bytes([136, 128, 144, 120])
    assert rz[2].decoder == "fake"  # non-image blobs keep the stand-in
    feats = {r.id: r for r in MM.extract_image_features(df).collect()}
    assert feats[1].mean_value == (136 + 128 + 144 + 120) / 4
    assert feats[1].decoder == "jpeg-dc"


def test_png_pixels_resize_area_means(spark):
    """4x4 gray PNG with known pixels through the resize seam at 2x2:
    each cell is the exact mean of its 2x2 source box."""
    rows = [
        bytes([10, 20, 100, 200]),
        bytes([30, 40, 100, 200]),
        bytes([0, 0, 50, 50]),
        bytes([0, 0, 150, 150]),
    ]
    png = _encode_png(4, 4, rows, color_type=0)
    got = MM.decode_image_png_pixels(png)
    assert got is not None and got[:2] == (4, 4) and got[3] == "png"
    assert got[2].shape == (4, 4)
    df = spark.createDataFrame([Row(id=1, blob=bytearray(png))], "id long, blob binary")
    r = MM.resize_image(df, width=2, height=2).collect()[0]
    assert r.decoder == "png"
    assert bytes(r.pixels) == bytes([25, 150, 0, 100])


def test_resize_area_means_match_per_cell_reference(spark):
    """The reduceat-vectorized area resampler must be bit-identical to
    the per-cell integer-boundary slice-mean it replaced, on awkward
    shapes: non-divisible downscale (37x23→8x8), pure upscale
    (5x3→8x8, replication boxes), and mixed (4x13→8x8)."""
    import numpy as np

    planes = {}
    rng = np.random.default_rng(7)
    for pid, (h, w) in enumerate([(37, 23), (5, 3), (4, 13)], start=1):
        planes[pid] = rng.integers(0, 256, size=(h, w), dtype=np.uint8)

    def fake_decoder_for(pid):
        plane = planes[pid]
        return (plane.shape[1], plane.shape[0], plane, "unit")

    def decoder(blob):
        return fake_decoder_for(int(bytes(blob)[0]))

    df = spark.createDataFrame(
        [Row(id=pid, blob=bytearray([pid])) for pid in planes],
        "id long, blob binary",
    )
    got = {
        r.id: np.frombuffer(bytes(r.pixels), dtype=np.uint8).reshape(8, 8)
        for r in MM.resize_image(df, width=8, height=8, pixel_decoder=decoder).collect()
    }
    for pid, plane in planes.items():
        src_h, src_w = plane.shape
        pf = plane.astype(np.float64)
        want = np.empty((8, 8), dtype=np.uint8)
        for j in range(8):
            y0 = j * src_h // 8
            y1 = max(y0 + 1, (j + 1) * src_h // 8)
            for i in range(8):
                x0 = i * src_w // 8
                x1 = max(x0 + 1, (i + 1) * src_w // 8)
                want[j, i] = np.uint8(min(255.0, np.rint(pf[y0:y1, x0:x1].mean())))
        assert np.array_equal(got[pid], want), pid


def test_jpeg_pixels_rejects_progressive_like_dc():
    progressive = (
        b"\xff\xd8"
        + _dqt(8)
        + (b"\xff\xc2" + _sof0(8, 8, [(1, 0x11)])[4:])
    )
    assert MM.decode_image_jpeg_pixels(progressive) is None
    assert MM.decode_image_jpeg_pixels(b"\xff\xd8\xff") is None


def test_jpeg_pixels_restart_markers_reset_dc_prediction():
    """DRI=1 with an RST0 between two MCUs: the entropy decoder must
    byte-align at the restart and reset DC prediction — block means
    136 then 128 (not 136/136+8), for both the DC triage decoder and
    the full-pixel plane."""
    dri = b"\xff\xdd" + (4).to_bytes(2, "big") + (1).to_bytes(2, "big")
    blob = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(16, 8, [(1, 0x11)])
        + _dht_multi(0, 0, [0, 2] + [0] * 14, [0x04, 0x00])  # 00→cat4, 01→cat0
        + _dht(1, 0, 0x00)  # AC: EOB only
        + dri
        + _sos([1])
        + _bits("00 1000 0")  # MCU 0: diff +8 → DC 8 → mean 136 (1-padded)
        + b"\xff\xd0"         # RST0: byte-align, pred resets
        + _bits("01 0")       # MCU 1: cat0 diff 0 → DC 0 → mean 128
        + b"\xff\xd9"
    )
    assert MM.decode_image_jpeg_dc(blob) == (16, 8, 132.0, "jpeg-dc")
    got = MM.decode_image_jpeg_pixels(blob)
    assert got is not None
    _w, _h, plane, _ = got
    assert plane.shape == (8, 16)
    assert (plane[:, :8] == 136).all()
    assert (plane[:, 8:] == 128).all()


def test_jpeg_pixels_420_luma_block_positions():
    """4:2:0 MCU with four DISTINCT flat luma blocks: data units are
    ordered left-to-right then top-to-bottom inside the MCU, so the
    decoded quadrants must land at (0,0)/(0,1)/(1,0)/(1,1) — a
    transposed assembly would swap 128/144. Chroma rides the same DC
    table with zero diffs."""
    blob = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(16, 16, [(1, 0x22), (2, 0x11), (3, 0x11)])
        + _dht_multi(0, 0, [0, 2] + [0] * 14, [0x04, 0x05])  # 00→cat4, 01→cat5
        + _dht(1, 0, 0x00)
        + _sos([1, 2, 3])
        # luma diffs +8, -8, +16, -24 → DC 8,0,16,-8 → means 136/128/144/120;
        # cat5 codes: -8 → 00111? no: cat4 of -8 is 0111 via '00'; see below
        + _bits("00 1000 0  00 0111 0  01 10000 0  01 00111 0  01 00000 0  01 00000 0")
        + b"\xff\xd9"
    )
    # chroma blocks: '01'(cat5) + 5 bits 00000 → extend(0,5) = -31 diff,
    # harmless (chroma is traversed, not reconstructed) but keeps the
    # stream aligned with only the two available codes.
    got = MM.decode_image_jpeg_pixels(blob)
    assert got is not None
    _w, _h, plane, _ = got
    assert plane.shape == (16, 16)
    assert (plane[:8, :8] == 136).all(), "top-left"
    assert (plane[:8, 8:] == 128).all(), "top-right"
    assert (plane[8:, :8] == 144).all(), "bottom-left"
    assert (plane[8:, 8:] == 120).all(), "bottom-right"
    assert MM.decode_image_jpeg_dc(blob)[:3] == (16, 16, 132.0)


def test_jpeg_pixels_subsampled_luma_upsamples_by_replication():
    """Luma at (1,1) against a (2,2) chroma component (legal, unusual):
    the luma plane decodes at half resolution (8x8 for a 16x16 image)
    and must replicate-upsample to full size."""
    blob = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(16, 16, [(1, 0x11), (2, 0x22)])
        + _dht_multi(0, 0, [0, 2] + [0] * 14, [0x04, 0x00])  # 00→cat4, 01→cat0
        + _dht(1, 0, 0x00)
        + _sos([1, 2])
        # MCU: 1 luma block (diff +8 → mean 136), then 4 chroma blocks
        # with cat0 (zero) diffs
        + _bits("00 1000 0  01 0  01 0  01 0  01 0")
        + b"\xff\xd9"
    )
    got = MM.decode_image_jpeg_pixels(blob)
    assert got is not None
    w, h, plane, _ = got
    assert (w, h) == (16, 16)
    assert plane.shape == (16, 16)
    assert (plane == 136).all()
    assert MM.decode_image_jpeg_dc(blob)[:3] == (16, 16, 136.0)


# ---------------------------------------------------------------------------
# Full-color JPEG: encoder-built fixtures, pixel-exact expected decode
# (VERDICT r9 #3)
# ---------------------------------------------------------------------------


def _expected_jpeg_rgb(rgb, subsampling):
    """Independent numpy reconstruction of what decoding an
    ``encode_image_jpeg_baseline`` stream must yield: forward transform +
    quantization via the exposed ``jpeg_quantized_blocks`` (shared
    arithmetic), then dequant/IDCT/assembly/upsample/inverse-601 computed
    HERE with plain numpy — so the decoder's entropy decode, zigzag,
    DPCM, byte unstuffing and MCU geometry are verified bit-for-bit by
    the pixel comparison."""
    import numpy as np

    from mapreduce_system_spark.operators import multimodal as MM

    rgbf = np.asarray(rgb, dtype=np.float64)
    h, w = rgbf.shape[:2]
    hs, vs = subsampling
    r, g, b = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    def box_down(p):
        if hs == 1 and vs == 1:
            return p
        ph, pw = -(-h // vs) * vs, -(-w // hs) * hs
        padded = np.empty((ph, pw))
        padded[:h, :w] = p
        padded[h:, :w] = p[h - 1 : h, :]
        padded[:h, w:] = p[:, w - 1 : w]
        padded[h:, w:] = p[h - 1, w - 1]
        return padded.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))

    m = MM._jpeg_idct_matrix()
    zzr = np.asarray(MM._JPEG_ZIGZAG)
    mcus_x, mcus_y = -(-w // (8 * hs)), -(-h // (8 * vs))

    def decode_plane(plane, qtab, ch, cv):
        by, bx, blocks = MM.jpeg_quantized_blocks(plane, qtab)
        gy, gx = mcus_y * cv, mcus_x * ch
        if by < gy or bx < gx:
            grid = np.empty((gy, gx, 8, 8), dtype=np.int64)
            grid[:by, :bx] = blocks
            grid[by:, :bx] = blocks[by - 1 : by, :]
            grid[:by, bx:] = blocks[:, bx - 1 : bx]
            grid[by:, bx:] = blocks[by - 1, bx - 1]
            blocks = grid
            by, bx = gy, gx
        q = np.asarray(qtab, dtype=np.float64).reshape(8, 8)
        out = np.zeros((by * 8, bx * 8))
        for rr in range(by):
            for cc in range(bx):
                f = blocks[rr, cc] * q
                out[rr * 8 : rr * 8 + 8, cc * 8 : cc * 8 + 8] = m.T @ f @ m + 128.0
        comp_w, comp_h = -(-w * ch // hs), -(-h * cv // vs)
        out = out[:comp_h, :comp_w]
        if ch != hs or cv != vs:
            out = np.repeat(np.repeat(out, vs // cv, axis=0), hs // ch, axis=1)
        return out[:h, :w]

    yd = decode_plane(y, MM._JPEG_STD_QT_LUMA, hs, vs)
    cbd = decode_plane(box_down(cb), MM._JPEG_STD_QT_CHROMA, 1, 1)
    crd = decode_plane(box_down(cr), MM._JPEG_STD_QT_CHROMA, 1, 1)
    rd = yd + 1.402 * (crd - 128.0)
    gd = yd - 0.344136 * (cbd - 128.0) - 0.714136 * (crd - 128.0)
    bd = yd + 1.772 * (cbd - 128.0)
    return (
        np.clip(np.rint(np.stack([rd, gd, bd], axis=2)), 0, 255).astype(np.uint8),
        np.clip(np.rint(yd), 0, 255).astype(np.uint8),
    )


def _gradient_rgb(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    r = (yy * 7 + xx * 3) % 256
    g = (yy * 2 + xx * 11 + 40) % 256
    b = (255 - (yy * 5 + xx * 5)) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


@pytest.mark.parametrize(
    "h,w,sub",
    [
        (21, 13, (2, 2)),  # 4:2:0, nothing MCU-aligned: pad/upsample/crop
        (16, 16, (1, 1)),  # 4:4:4, aligned
        (16, 24, (2, 1)),  # 4:2:2-style horizontal-only subsampling
        (8, 8, (2, 2)),    # single MCU, chroma below one block
    ],
)
def test_jpeg_rgb_decode_pixel_exact(h, w, sub):
    from mapreduce_system_spark.operators.multimodal import (
        decode_image_jpeg_pixels,
        decode_image_jpeg_rgb,
        encode_image_jpeg_baseline,
    )

    rgb = _gradient_rgb(h, w)
    blob = encode_image_jpeg_baseline(rgb, subsampling=sub)
    want_rgb, want_y = _expected_jpeg_rgb(rgb, sub)
    got = decode_image_jpeg_rgb(blob)
    assert got is not None and got[3] == "jpeg-rgb"
    assert (got[0], got[1]) == (w, h)
    assert (got[2] == want_rgb).all()
    # the luma-only seam must be unchanged by the chroma work and agree
    # with the same reconstruction's Y plane
    gray = decode_image_jpeg_pixels(blob)
    assert gray is not None and (gray[2] == want_y).all()


def test_jpeg_rgb_grayscale_stream_replicates_luma():
    """A single-component JPEG has no chroma: the RGB seam replicates Y
    (the JFIF grayscale convention) instead of failing the blob."""
    import numpy as np

    from mapreduce_system_spark.operators.multimodal import (
        decode_image_jpeg_pixels,
        decode_image_jpeg_rgb,
    )

    blob = (
        b"\xff\xd8"
        + _dqt(8)
        + _sof0(8, 8, [(1, 0x11)])
        + _dht(0, 0, 0x04)
        + _dht(1, 0, 0x00)
        + _sos([1])
        + bytes([0b01000011])
        + b"\xff\xd9"
    )
    got = decode_image_jpeg_rgb(blob)
    gray = decode_image_jpeg_pixels(blob)
    assert got is not None and got[3] == "jpeg-rgb"
    assert got[2].shape == (8, 8, 3)
    assert (got[2] == np.stack([gray[2]] * 3, axis=2)).all()


def test_jpeg_rgb_rejects_same_streams_as_gray():
    from mapreduce_system_spark.operators.multimodal import decode_image_jpeg_rgb

    progressive = b"\xff\xd8" + b"\xff\xc2" + (10).to_bytes(2, "big") + bytes(8)
    assert decode_image_jpeg_rgb(progressive) is None
    assert decode_image_jpeg_rgb(b"not a jpeg") is None


def test_jpeg_decoder_matches_components_by_id_not_scan_position():
    """T.81 fixes no component declaration order — only JFIF's id
    assignment (1=Y, 2=Cb, 3=Cr) defines the color mapping. A stream
    declaring Y,Cr,Cb (or chroma-first) must decode to the identical
    image, not swapped hues (r10 review: positional scan_comps[1]/[2]
    silently exchanged Cb/Cr)."""
    import numpy as np

    from mapreduce_system_spark.operators.multimodal import (
        decode_image_jpeg_rgb,
        encode_image_jpeg_baseline,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    for sub in ((1, 1), (2, 2)):
        base = decode_image_jpeg_rgb(encode_image_jpeg_baseline(img, subsampling=sub))
        assert base is not None
        for order in ((1, 3, 2), (3, 2, 1), (2, 1, 3)):
            blob = encode_image_jpeg_baseline(img, subsampling=sub, _comp_order=order)
            got = decode_image_jpeg_rgb(blob)
            assert got is not None, (sub, order)
            assert got[0:2] == base[0:2]
            assert np.array_equal(got[2], base[2]), (sub, order)


def test_jpeg_decoder_rejects_non_jfif_component_ids():
    """3-component streams whose ids aren't {1,2,3} have an unknowable
    Y/Cb/Cr mapping — per-blob None, never a silently mis-colored
    decode."""
    import numpy as np

    from mapreduce_system_spark.operators.multimodal import (
        decode_image_jpeg_dc,
        decode_image_jpeg_rgb,
        encode_image_jpeg_baseline,
    )

    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    blob = bytearray(encode_image_jpeg_baseline(img, subsampling=(1, 1)))
    # relabel component ids 1,2,3 -> 4,5,6 in SOF and SOS
    sof = blob.find(b"\xff\xc0")
    for k in range(3):
        assert blob[sof + 10 + 3 * k] == k + 1
        blob[sof + 10 + 3 * k] = k + 4
    sos = blob.find(b"\xff\xda")
    for k in range(3):
        assert blob[sos + 5 + 2 * k] == k + 1
        blob[sos + 5 + 2 * k] = k + 4
    assert decode_image_jpeg_rgb(bytes(blob)) is None
    assert decode_image_jpeg_dc(bytes(blob)) is None


def test_jpeg_encoder_rejects_out_of_range_dimensions():
    """The SOF height/width fields are 16-bit: reject 0 or >65535 at
    entry with a clear ValueError instead of an OverflowError after the
    full DCT/entropy pipeline has run."""
    import numpy as np
    import pytest

    from mapreduce_system_spark.operators.multimodal import (
        encode_image_jpeg_baseline,
    )

    with pytest.raises(ValueError, match="65535"):
        encode_image_jpeg_baseline(np.zeros((0, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="65535"):
        encode_image_jpeg_baseline(np.zeros((8, 70000, 3), dtype=np.uint8))


def test_png_decompression_bomb_is_bounded_not_allocated():
    """A tiny blob whose IHDR declares huge dimensions with a ~1000:1
    zlib IDAT must be rejected by the pre-inflate bound (returns None
    fast), never allocated: inside a memory-capped executor that
    allocation is a cgroup kill, not a catchable exception."""
    import struct
    import time
    import zlib

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data)
        )

    # declares a 50000x50000 RGB image (7.5 GB plane) but ships ~7 MB of
    # highly compressible zeros
    ihdr = struct.pack(">IIBBBBB", 50000, 50000, 8, 2, 0, 0, 0)
    idat = zlib.compress(bytes(1 << 23), 9)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    t0 = time.time()
    assert MM.decode_image_png(bomb) is None
    assert time.time() - t0 < 2.0  # rejected at the header bound, not inflated


def test_png_oversized_inflation_under_dim_cap_is_truncated_safely():
    """Even when the declared plane fits the cap, an IDAT stream that
    inflates to MORE than the declared plane must be rejected (bounded
    decompressobj read), not trusted."""
    import struct
    import zlib

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # gray 2x2: 6 bytes
    idat = zlib.compress(bytes(1000))  # inflates far past the plane
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    assert MM.decode_image_png(blob) is None


def test_blob_schema_matches_binarize_text_output(spark):
    """BLOB_SCHEMA is the documented shape of the ingestion stand-in —
    keep it checked against the actual output, not drift-prone prose."""
    df = spark.createDataFrame([Row(doc_id=1, text="hi")])
    out = MM.binarize_text(df)
    want = spark.createDataFrame([], MM.BLOB_SCHEMA).schema
    got = out.schema
    assert [f.name for f in got.fields] == [f.name for f in want.fields]
    assert [f.dataType for f in got.fields] == [f.dataType for f in want.fields]


def test_jpeg_declared_dimension_bomb_is_rejected_before_allocation():
    """A crafted SOF declaring huge dimensions must be rejected at the
    header (the PNG bomb guard's sibling): the reconstruction planes and
    the coefficient store are sized from the SOF alone, before any
    entropy data is validated."""
    import struct
    import time

    # SOI + SOF0 declaring 60000x60000, 1 component
    sof = (
        b"\xff\xc0"
        + struct.pack(">H", 11)  # segment length
        + b"\x08"  # precision 8
        + struct.pack(">H", 60000)
        + struct.pack(">H", 60000)
        + b"\x01"  # 1 component
        + b"\x01\x11\x00"  # id 1, 1x1 sampling, qtable 0
    )
    blob = b"\xff\xd8" + sof
    t0 = time.time()
    assert MM.decode_image_jpeg_dc(blob) is None
    assert MM.decode_image_jpeg_pixels(blob) is None
    assert MM.decode_image_jpeg_rgb(blob) is None
    assert time.time() - t0 < 1.0
