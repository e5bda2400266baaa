"""Multimodal columns: opaque binary blobs + typed metadata.

North-star LLM-pipeline surface. The design treats image/audio/video as
``BinaryType`` columns with a metadata struct alongside; all processing is
Arrow-batched ``mapInPandas`` (columnar transfer, no pickled rows). The
actual media *decode* step needs codec libraries that are not in this
container — it is stubbed behind an import-try with a clearly-marked
deterministic fallback, while everything Spark-side (schemas, batch
shapes, UDF signatures, partitioning) is real and tested.

Scale notes: blobs ride the shuffle only if you shuffle them — keep
feature extraction *before* any groupBy/join and project blobs away as
soon as features are out (these functions do). ``maxPartitionBytes``
governs scan-task sizing; Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds per-batch
memory for wide blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_system_spark.pyfiles import ensure_package_on_executors
from mapreduce_system_spark.sources.tables import ensure_parallelism

BLOB_SCHEMA = "id long, blob binary, content_type string, n_bytes long"
FEATURE_SCHEMA = "id long, n_bytes long, md5 string"
IMAGE_FEATURE_SCHEMA = "id long, width int, height int, mean_value double, decoder string"
FRAME_SCHEMA = "id long, frame_idx int, frame binary"


def binarize_text(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Demo ingestion path: text → (id, blob, content_type, n_bytes).

    Stands in for reading real media files; at scale the blob column comes
    from ``spark.read.format("binaryFile")`` with identical downstream
    shape.
    """
    # NULL text → empty blob (not NULL): every downstream extractor calls
    # bytes(blob)/len(blob), which would raise on None mid-stage.
    text = F.coalesce(F.col(text_col), F.lit(""))
    return ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.encode(text, "UTF-8").alias("blob"),
        F.lit("text/plain").alias("content_type"),
        F.octet_length(text).cast("long").alias("n_bytes"),
    )


def blob_features(df: DataFrame, id_col: str = "id", blob_col: str = "blob") -> DataFrame:
    """Byte-level features per blob via Arrow-batched mapInPandas:
    (id, n_bytes, md5). The pattern every decode/extract op follows."""

    ensure_package_on_executors(df.sparkSession)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "md5": blobs.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(extract, schema=FEATURE_SCHEMA)


_PIL_IMAGE_CACHE: list = []  # [PIL.Image module or None], resolved once


def _pil_image():
    """PIL.Image or None, resolved ONCE per interpreter: Python does not
    negatively cache failed imports, so re-attempting ``from PIL import
    Image`` per blob pays a raised ImportError (~57 us measured here) on
    every row of the hot mapInPandas path in a container without PIL."""
    if not _PIL_IMAGE_CACHE:
        try:
            from PIL import Image  # type: ignore

            _PIL_IMAGE_CACHE.append(Image)
        except Exception:
            _PIL_IMAGE_CACHE.append(None)
    return _PIL_IMAGE_CACHE[0]


def _decode_image_real(blob: bytes):
    """Real decoder — requires an imaging library absent from this
    container. Cited for the intended production path.

    Status (checked round 3): ``import PIL`` raises ModuleNotFoundError in
    this environment and installing packages is out of scope, so every
    fixture run takes the deterministic-fake branch. The import-try is
    kept because the switch is purely environmental: with PIL present this
    function lights up and ``decoder`` flips to ``"pil"`` with zero engine
    changes."""
    Image = _pil_image()
    if Image is None:
        return None
    try:
        import io

        img = Image.open(io.BytesIO(blob))
        n_px = img.width * img.height
        if n_px == 0:
            return None
        return (
            img.width,
            img.height,
            float(sum(img.convert("L").getdata())) / n_px,
            "pil",
        )
    except Exception:
        # ImportError (no PIL) or a decode failure (non-image bytes,
        # truncated file): fall back to the deterministic stand-in rather
        # than failing the whole Spark stage on one bad blob.
        return None


def decode_image_png(blob: bytes):
    """REAL codec for the image adapter seam: stdlib-only PNG decode —
    chunk walk, zlib inflate of the IDAT stream, and per-scanline filter
    reconstruction (None/Sub/Up/Average/Paeth) — no third-party package,
    so unlike the PIL path this real decode is exercisable in this
    container (the image twin of ``decode_audio_wave``).

    ``bytes -> (width, height, mean_value, name) | None``; returns None
    for non-PNG/truncated bytes or unsupported shapes (only 8-bit depth,
    color types 0/2/4/6, non-interlaced) so a mixed corpus falls back to
    the stand-in per blob instead of failing the stage. ``mean_value``
    is the mean ITU-R 601-2 integer luma ((299R+587G+114B)//1000; PIL's
    convert('L') truncates the fixed-point form (19595R+38470G+7471B)>>16,
    which can differ by 1 LSB on some pixels — e.g. RGB=(4,0,86) — so the
    two real decoders agree to within 1 LSB per pixel, not bit-exactly),
    alpha ignored.

    Pure-Python per-scanline loops are fine here: the adapter contract
    is per-blob ``bytes -> features``, and at scale the cost center is
    the codec itself, which a production deployment swaps for a native
    one through this same seam."""
    rec = _png_reconstruct(blob)
    if rec is None:
        return None
    width, height, channels, gray, lines = rec
    total = 0
    try:
        for line in lines:
            if gray:
                total += sum(line[0::channels])
            else:
                for i in range(0, width * channels, channels):
                    total += (
                        299 * line[i] + 587 * line[i + 1] + 114 * line[i + 2]
                    ) // 1000
    except ValueError:  # bad filter byte mid-stream
        return None
    return (width, height, total / (width * height), "png")


# inflate cap for untrusted PNGs: covers every plausible curation input
# (64 MiB plane = e.g. 4096x4096 RGBA) while bounding decompression-bomb
# allocations to the cap instead of the bomb's declared size
_MAX_PNG_PLANE_BYTES = 64 * 1024 * 1024


def _png_reconstruct(blob: bytes):
    """Shared PNG scanline reconstruction (chunk walk, zlib inflate,
    None/Sub/Up/Average/Paeth filters): ``bytes -> (width, height,
    channels, is_gray, <scanline generator>) | None``. Consumed by
    ``decode_image_png`` (luma mean) and ``decode_image_png_pixels``
    (full luma plane for the resize seam).

    The scanlines come back as a GENERATOR, not a list: the mean-only
    consumer keeps O(stride) live bytes (current + previous line) the
    way it did before the r9 pixel-seam refactor shared this code —
    buffering the whole plane here would roughly double the per-blob
    peak of the mapInPandas stage for that consumer on large images.
    The generator raises ``ValueError`` on an invalid filter byte;
    callers translate that to the usual ``None`` (fall back to the
    stand-in for this blob)."""
    import zlib

    try:
        if not blob.startswith(b"\x89PNG\r\n\x1a\n"):
            return None
        pos, width, height = 8, None, None
        bit_depth = color_type = interlace = None
        idat = bytearray()
        while pos + 8 <= len(blob):
            ln = int.from_bytes(blob[pos : pos + 4], "big")
            typ = blob[pos + 4 : pos + 8]
            data = blob[pos + 8 : pos + 8 + ln]
            if len(data) != ln:
                return None
            if typ == b"IHDR":
                width = int.from_bytes(data[0:4], "big")
                height = int.from_bytes(data[4:8], "big")
                bit_depth, color_type, _c, _f, interlace = data[8:13]
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
            pos += 12 + ln  # 4 length + 4 type + data + 4 CRC
        if not width or not height or bit_depth != 8 or interlace != 0:
            return None
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            return None
        stride = width * channels
        expected = (stride + 1) * height
        # bound BEFORE inflating: a tiny crafted blob whose IHDR declares
        # huge dimensions (or whose IDAT inflates at ~1000:1) would
        # otherwise allocate gigabytes inside zlib.decompress and get the
        # executor cgroup-killed — uncatchable, failing the whole stage
        # the per-blob-fallback design exists to protect
        if expected > _MAX_PNG_PLANE_BYTES:
            return None
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
        if len(raw) != expected:
            return None
    except Exception:
        return None

    def lines():
        prev = bytearray(stride)
        for y in range(height):
            off = y * (stride + 1)
            f = raw[off]
            line = bytearray(raw[off + 1 : off + 1 + stride])
            if f == 1:  # Sub
                for i in range(channels, stride):
                    line[i] = (line[i] + line[i - channels]) & 0xFF
            elif f == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif f == 3:  # Average
                for i in range(stride):
                    a = line[i - channels] if i >= channels else 0
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for i in range(stride):
                    a = line[i - channels] if i >= channels else 0
                    b = prev[i]
                    c = prev[i - channels] if i >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[i] = (line[i] + pred) & 0xFF
            elif f != 0:
                raise ValueError("bad PNG filter byte")
            yield line
            prev = line

    return (width, height, channels, color_type in (0, 4), lines())


def decode_image_png_pixels(blob: bytes):
    """Full-pixel PNG decode for the resize seam: ``bytes -> (width,
    height, HxW uint8 luma ndarray, "png") | None``. Same reconstruction
    and integer ITU-R 601-2 luma as ``decode_image_png`` — the plane's
    mean equals that decoder's ``mean_value`` by construction."""
    import numpy as np

    rec = _png_reconstruct(blob)
    if rec is None:
        return None
    width, height, channels, gray, lines = rec
    plane = np.empty((height, width), dtype=np.uint8)
    try:
        for y, line in enumerate(lines):
            a = np.frombuffer(bytes(line), dtype=np.uint8).reshape(width, channels)
            if gray:
                plane[y] = a[:, 0]
            else:
                px = (
                    299 * a[:, 0].astype(np.int32)
                    + 587 * a[:, 1].astype(np.int32)
                    + 114 * a[:, 2].astype(np.int32)
                ) // 1000
                plane[y] = px.astype(np.uint8)
    except ValueError:  # bad filter byte mid-stream
        return None
    return (width, height, plane, "png")


def decode_image_jpeg_dc(blob: bytes):
    """REAL codec #2 for the image adapter seam: stdlib-only BASELINE
    JPEG structural decode — marker walk, canonical Huffman table
    construction, full entropy decode of the scan (byte unstuffing,
    restart markers, DC prediction, AC run-length traversal) — with the
    feature extraction stopping at the DC term: the DC coefficient of
    an 8×8 block IS 8× its pixel mean, so ``mean_value`` falls out of
    the entropy decode with no dequant/IDCT of the 63 AC terms. JPEG's
    Y channel is ITU-R 601 luma, the same quantity the PNG decoder and
    PIL's ``convert('L')`` compute, so the decoders agree where support
    overlaps (to DCT rounding).

    ``bytes -> (width, height, mean_value, "jpeg-dc") | None``; None for
    non-JPEG/truncated/progressive (SOF2) or arithmetic-coded streams,
    so a mixed corpus falls back per blob instead of failing the stage.
    ``mean_value`` averages over the MCU-padded block grid — exact for
    MCU-aligned dimensions, edge-block-weighted otherwise (documented
    contract; the full-IDCT path belongs to the PIL seam).

    The LLM-pipeline motivation: JPEG is the dominant web image format,
    and (width, height, mean-luma) per blob — resolution filtering,
    black/blank frame detection — is exactly the triage a 100 TB crawl
    pipeline runs BEFORE shipping bytes to an expensive full decode."""
    return _jpeg_decode(blob, pixels=False)


# zigzag position k -> raster index within the 8x8 block (ITU T.81 fig. 5)
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

_JPEG_IDCT_M = None  # 8x8 IDCT basis, built lazily (numpy import cost)


def _jpeg_idct_matrix():
    global _JPEG_IDCT_M
    if _JPEG_IDCT_M is None:
        import numpy as np

        u = np.arange(8).reshape(8, 1)
        x = np.arange(8).reshape(1, 8)
        m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
        m[0, :] *= 1.0 / np.sqrt(2.0)
        _JPEG_IDCT_M = m
    return _JPEG_IDCT_M


def decode_image_jpeg_pixels(blob: bytes):
    """Full-pixel baseline-JPEG decode for the resize seam: ``bytes ->
    (width, height, HxW uint8 luma ndarray, "jpeg") | None``.

    Extends the DC triage decoder with the remaining reconstruction
    stages: every luma coefficient is kept through the entropy decode
    (inverse zigzag), dequantized against its table, inverse-DCT'd
    (separable 8×8 basis, float64), level-shifted +128 and clamped; the
    block grid is assembled into the component plane, cropped to the
    component's natural resolution, and UPSAMPLED by replication to the
    full image when the luma component is subsampled (rare — Y is
    normally the max-factor component). Chroma blocks are traversed
    (the stream demands it) but not reconstructed: JPEG's Y channel IS
    the ITU-R 601 luma every consumer of this seam wants — the same
    quantity the PNG decoder and PIL's ``convert('L')`` compute — so
    color-space work adds nothing to the gray pipeline and belongs to
    the PIL seam when RGB output is actually needed. Same fallback
    contract as the DC decoder: None for progressive/arithmetic/
    truncated streams, so a mixed corpus falls back per blob."""
    return _jpeg_decode(blob, pixels=True)


def decode_image_jpeg_rgb(blob: bytes):
    """Full-color baseline-JPEG decode: ``bytes -> (width, height,
    HxWx3 uint8 RGB ndarray, "jpeg-rgb") | None``.

    The chroma half of VERDICT r9 #3: Cb/Cr coefficients ride the same
    entropy/dequant/IDCT path as luma, replicate-upsample to full
    resolution (the 4:2:0/4:2:2 case), and the inverse ITU-R BT.601
    full-range transform (the JFIF YCbCr definition) combines the float
    planes before one round+clamp. Grayscale JPEGs replicate Y into all
    three channels; 4-component (Adobe CMYK) streams and every fallback
    class of the gray decoder return None per blob. Pixel-exactness is
    pinned against an independent numpy reconstruction of encoder
    coefficients in tests/test_multimodal.py."""
    return _jpeg_decode(blob, pixels=True, rgb=True)


# declared-dimension cap for untrusted JPEGs (the _MAX_PNG_PLANE_BYTES
# sibling): bounds the float64 reconstruction planes and the per-block
# coefficient store that are sized from the SOF header alone
_MAX_JPEG_PIXELS = 4 * 1024 * 1024


def _jpeg_decode(blob: bytes, pixels: bool, rgb: bool = False):
    try:
        if not blob.startswith(b"\xff\xd8"):
            return None
        pos = 2
        qt: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        width = height = None
        comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
        restart_interval = 0
        scan_comps: list[tuple[int, int, int]] = []  # (comp_idx, dc_tbl, ac_tbl)
        while pos + 4 <= len(blob):
            if blob[pos] != 0xFF:
                return None
            marker = blob[pos + 1]
            if marker == 0xD9:  # EOI before SOS
                return None
            ln = int.from_bytes(blob[pos + 2 : pos + 4], "big")
            seg = blob[pos + 4 : pos + 2 + ln]
            if len(seg) != ln - 2:
                return None
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0xF
                    i += 1
                    n = 64 * (2 if pq else 1)
                    raw = seg[i : i + n]
                    if len(raw) != n:
                        return None
                    if pq:
                        qt[tq] = [int.from_bytes(raw[j : j + 2], "big") for j in range(0, 128, 2)]
                    else:
                        qt[tq] = list(raw)
                    i += n
            elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
                if seg[0] != 8:
                    # 12-bit extended-sequential is legal under 0xC1; the
                    # 8-bit level shift and 0-255 clamp would decode it to
                    # garbage SILENTLY — out of scope, fall back per blob
                    return None
                height = int.from_bytes(seg[1:3], "big")
                width = int.from_bytes(seg[3:5], "big")
                # the PNG bomb guard's JPEG sibling: declared dimensions
                # size the per-component float64 planes AND the per-block
                # coefficient store, both allocated before any pixel is
                # checked — a crafted SOF + a few MB of EOB-only entropy
                # data would otherwise OOM the executor (uncatchable
                # cgroup kill). 4 MP/component = 32 MB float64 plane.
                if width * height > _MAX_JPEG_PIXELS:
                    return None
                nc = seg[5]
                comps = [
                    (seg[6 + 3 * c], seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 0xF, seg[8 + 3 * c])
                    for c in range(nc)
                ]
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # progressive / extended / arithmetic: out of scope
            elif marker == 0xC4:  # DHT — canonical code construction
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0xF
                    counts = seg[i + 1 : i + 17]
                    if len(counts) != 16:
                        return None
                    syms = seg[i + 17 : i + 17 + sum(counts)]
                    table: dict[tuple[int, int], int] = {}
                    code, k = 0, 0
                    for bits in range(1, 17):
                        for _ in range(counts[bits - 1]):
                            table[(bits, code)] = syms[k]
                            code += 1
                            k += 1
                        code <<= 1
                    huff[(tc, th)] = table
                    i += 17 + sum(counts)
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS
                ns = seg[0]
                if ns != len(comps):
                    # non-interleaved stream (one SOS per component): the
                    # interleaved MCU geometry below would decode it into
                    # a spatially scrambled plane — and when dimensions
                    # are MCU-aligned the block count coincides, so no
                    # error would fire. Out of scope, fall back per blob.
                    return None
                by_id = {c[0]: idx for idx, c in enumerate(comps)}
                for s in range(ns):
                    cid, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                    scan_comps.append((by_id[cid], tt >> 4, tt & 0xF))
                pos += 2 + ln
                break
            pos += 2 + ln
        if width is None or not comps or not scan_comps:
            return None
        # Components are matched by ID, not scan position: T.81 fixes no
        # id assignment and no declaration order — only JFIF's convention
        # (1=Y, 2=Cb, 3=Cr) makes the color mapping knowable. A 3-channel
        # stream with any other ids would decode to silently swapped hues
        # under a positional assumption → reject per blob (scramble rule).
        idx_of = {c[0]: i for i, c in enumerate(comps)}
        if len(comps) == 3 and sorted(idx_of) != [1, 2, 3]:
            return None

        data = blob[pos:]
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcus_x = -(-width // (8 * hmax))
        mcus_y = -(-height // (8 * vmax))

        bitpos = 0  # bit cursor into the unstuffed stream, managed inline

        # inline bit reader over the stuffed stream: 0xFF00 → literal 0xFF;
        # 0xFFD0-D7 handled at restart boundaries by the MCU loop
        stream = bytearray()
        i = 0
        markers_at: list[int] = []  # byte offsets (in `stream`) of restarts
        while i < len(data):
            b = data[i]
            if b == 0xFF:
                nxt = data[i + 1] if i + 1 < len(data) else None
                if nxt == 0x00:
                    stream.append(0xFF)
                    i += 2
                    continue
                if nxt is not None and 0xD0 <= nxt <= 0xD7:
                    markers_at.append(len(stream))
                    i += 2
                    continue
                break  # EOI or next marker — end of entropy data
            stream.append(b)
            i += 1

        def read_bit() -> int:
            nonlocal bitpos
            byte = stream[bitpos >> 3]
            bit = (byte >> (7 - (bitpos & 7))) & 1
            bitpos += 1
            return bit

        def read_bits(n: int) -> int:
            v = 0
            for _ in range(n):
                v = (v << 1) | read_bit()
            return v

        def decode_sym(table) -> int:
            code, bits = 0, 0
            while bits < 16:
                code = (code << 1) | read_bit()
                bits += 1
                sym = table.get((bits, code))
                if sym is not None:
                    return sym
            raise ValueError("bad huffman stream")

        def extend(v: int, t: int) -> int:
            return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v

        pred = [0] * len(comps)
        luma_idx = idx_of[1] if len(comps) == 3 else scan_comps[0][0]
        luma_dc_sum = 0
        luma_blocks = 0
        # per-component coefficient blocks: luma only for the gray seam,
        # every component for the RGB seam (the chroma traversal happens
        # regardless — the stream demands it — so keeping the chroma
        # coefficients costs only their storage)
        coef_blocks: dict[int, list[tuple[int, int, list[int]]]] = {}
        restart_seen = 0
        mcu_count = 0
        for _my in range(mcus_y):
            for _mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    # byte-align to the recorded restart boundary
                    if restart_seen < len(markers_at):
                        bitpos = markers_at[restart_seen] * 8
                        restart_seen += 1
                        pred = [0] * len(comps)
                for ci, dc_t, ac_t in scan_comps:
                    _cid, ch, cv, _tq = comps[ci]
                    for _b in range(ch * cv):
                        want = pixels and (rgb or ci == luma_idx)
                        coefs = [0] * 64 if want else None
                        t = decode_sym(huff[(0, dc_t)])
                        diff = extend(read_bits(t), t) if t else 0
                        pred[ci] += diff
                        if ci == luma_idx:
                            luma_dc_sum += pred[ci]
                            luma_blocks += 1
                        if want:
                            coefs[0] = pred[ci]
                        k = 1
                        while k <= 63:
                            rs = decode_sym(huff[(1, ac_t)])
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            v = read_bits(s)  # AC value (zigzag position k)
                            if want and k <= 63:
                                coefs[k] = extend(v, s)
                            k += 1
                        if want:
                            bv, bh2 = divmod(_b, ch)
                            coef_blocks.setdefault(ci, []).append(
                                (_my * cv + bv, _mx * ch + bh2, coefs)
                            )
                mcu_count += 1
        if not luma_blocks:
            return None
        if not pixels:
            q0 = qt[comps[luma_idx][3]][0]
            # per-block pixel mean = DC·q0/8 + 128 (level shift); avg blocks
            mean = (luma_dc_sum * q0) / (8.0 * luma_blocks) + 128.0
            return (width, height, min(255.0, max(0.0, mean)), "jpeg-dc")

        # full reconstruction per component: dequant (zigzag-ordered
        # tables), inverse zigzag, separable 8x8 IDCT, +128 level shift,
        # assemble + crop, replicate-upsample subsampled components
        import numpy as np

        zz = np.asarray(_JPEG_ZIGZAG)
        m = _jpeg_idct_matrix()

        def reconstruct(ci: int):
            _cid2, ch, cv, tq = comps[ci]
            if hmax % ch or vmax % cv:
                return None  # non-integral upsampling factor: out of scope
            qtab = np.asarray(qt[tq], dtype=np.float64)
            plane = np.zeros(
                (mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64
            )
            fr = np.zeros(64, dtype=np.float64)
            for brow, bcol, coefs in coef_blocks.get(ci, ()):
                fr[zz] = np.asarray(coefs, dtype=np.float64) * qtab
                px = m.T @ fr.reshape(8, 8) @ m + 128.0
                plane[brow * 8 : brow * 8 + 8, bcol * 8 : bcol * 8 + 8] = px
            comp_w = -(-width * ch // hmax)
            comp_h = -(-height * cv // vmax)
            plane = plane[:comp_h, :comp_w]
            if ch != hmax or cv != vmax:
                plane = np.repeat(
                    np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
                )
            return plane[:height, :width]

        y = reconstruct(luma_idx)
        if y is None:
            return None
        if not rgb:
            plane = np.clip(np.rint(y), 0.0, 255.0).astype(np.uint8)
            return (width, height, plane, "jpeg")

        if len(scan_comps) == 1:
            # grayscale JPEG: replicate luma — the JFIF single-component
            # convention (no chroma to reconstruct)
            g = np.clip(np.rint(y), 0.0, 255.0).astype(np.uint8)
            return (width, height, np.stack([g, g, g], axis=2), "jpeg-rgb")
        if len(scan_comps) != 3:
            return None  # CMYK/Adobe 4-component: out of scope
        cb = reconstruct(idx_of[2])
        cr = reconstruct(idx_of[3])
        if cb is None or cr is None:
            return None
        # inverse ITU-R BT.601 full-range (the JFIF YCbCr definition):
        # the float planes are combined BEFORE the single round+clamp, so
        # chroma-upsample replication is the only spatial approximation
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb_px = np.clip(
            np.rint(np.stack([r, g, b], axis=2)), 0.0, 255.0
        ).astype(np.uint8)
        return (width, height, rgb_px, "jpeg-rgb")
    except Exception:
        return None


# ---------------------------------------------------------------------------
# GIF — real codec #3 through the image adapter seam (staged r12 for the
# r13 registered query, the PNG/JPEG staging pattern)
# ---------------------------------------------------------------------------

# decode-bomb bound, the PNG discipline: a GIF header is 13 bytes and can
# DECLARE any dimensions — cap the pixel plane before allocating anything
_GIF_MAX_PIXELS = 16 * 1024 * 1024  # 4096 x 4096


def _gif_subblocks(buf: bytes, pos: int):
    """Reassemble a GIF length-prefixed sub-block chain starting at
    ``pos``: ``(joined bytes, position after the 0 terminator) | None``
    on truncation."""
    parts = []
    n_buf = len(buf)
    while True:
        if pos >= n_buf:
            return None
        n = buf[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > n_buf:
            return None
        parts.append(buf[pos : pos + n])
        pos += n


def _gif_lzw_decode(data: bytes, min_code_size: int, max_pixels: int):
    """GIF-variant LZW: variable code width (min+1 → 12 bits, LSB-first
    bit packing), CLEAR resets the dictionary, EOI ends the stream, and
    the ``code == next_entry`` case is the standard KwKwK construction.
    Returns the index bytes or None on a corrupt stream; output is capped
    at ``max_pixels`` (a stream cannot allocate past the declared frame)."""
    if not 2 <= min_code_size <= 8:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    d = list(roots)
    size = min_code_size + 1
    out = bytearray()
    prev = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + size <= nbits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << size) - 1)
        bitpos += size
        if code == clear:
            d = list(roots)
            size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(d):
                return None
            entry = d[code]
        elif code < len(d):
            entry = d[code]
            if len(d) < 4096:  # spec: table is full at 4096 — a
                # conformant encoder stops adding too, so growth past it
                # would only buy unreachable (>12-bit) entries at
                # stream-length memory cost (ADVICE r12)
                d.append(prev + entry[:1])
        elif code == len(d) and len(d) < 4096:
            entry = prev + prev[:1]  # KwKwK
            d.append(entry)
        else:
            return None
        out += entry
        if len(out) >= max_pixels:
            return bytes(out[:max_pixels])
        prev = entry
        if len(d) == (1 << size) and size < 12:
            size += 1
    # missing EOI: tolerate (many real encoders truncate), return what
    # decoded — the caller checks the pixel count against the frame
    return bytes(out)


# interlaced GIFs store rows in four passes; for the mean-luma seam the
# row PERMUTATION is irrelevant (a mean is order-free), but the pass
# structure is parsed so the flag is honestly supported, not ignored
_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_interlace_order(height: int) -> list[int]:
    """The source-row order an interlaced GIF stores: row indices by the
    four-pass schedule. Shared by the encoder (which must WRITE rows in
    this order) and any pixel-order-sensitive consumer."""
    return [
        r
        for start, step in _GIF_INTERLACE_PASSES
        for r in range(start, height, step)
    ]


def _gif_parse_first_frame(blob: bytes):
    """Walk the GIF container to the FIRST image descriptor:
    ``(width, height, palette bytes, index bytes) | None``. Scope
    (documented, None otherwise → per-blob stand-in fallback, the PNG
    discipline): GIF87a/89a, a first frame covering the full logical
    screen, global or local color table present. Later frames of an
    animated GIF are ignored by design — curation features describe the
    poster frame. Transparency (GCE) is parsed and skipped: for corpus
    statistics the transparent index's palette color is as deterministic
    a choice as any compositing rule, and needs no background state."""
    if len(blob) < 13 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw = int.from_bytes(blob[6:8], "little")
    sh = int.from_bytes(blob[8:10], "little")
    packed = blob[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        if pos + n > len(blob):
            return None
        gct = blob[pos : pos + n]
        pos += n
    if sw * sh > _GIF_MAX_PIXELS or sw == 0 or sh == 0:
        return None
    while pos < len(blob):
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:  # trailer before any image
            return None
        if b0 == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= len(blob):
                return None
            pos += 1
            sub = _gif_subblocks(blob, pos)
            if sub is None:
                return None
            pos = sub[1]
            continue
        if b0 != 0x2C:  # unknown block type: corrupt
            return None
        if pos + 9 > len(blob):
            return None
        left = int.from_bytes(blob[pos : pos + 2], "little")
        top = int.from_bytes(blob[pos + 2 : pos + 4], "little")
        fw = int.from_bytes(blob[pos + 4 : pos + 6], "little")
        fh = int.from_bytes(blob[pos + 6 : pos + 8], "little")
        ipacked = blob[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            if pos + n > len(blob):
                return None
            pal = blob[pos : pos + n]
            pos += n
        if (left, top, fw, fh) != (0, 0, sw, sh) or pal is None:
            return None  # partial-screen frame / no palette: out of scope
        if pos >= len(blob):
            return None
        min_code = blob[pos]
        pos += 1
        sub = _gif_subblocks(blob, pos)
        if sub is None:
            return None
        idx = _gif_lzw_decode(sub[0], min_code, fw * fh)
        if idx is None or len(idx) < fw * fh:
            return None
        return fw, fh, pal, idx
    return None


def _gif_palette_luma(pal: bytes) -> list[int]:
    """Per-slot ITU-R 601-2 integer luma of a GIF color table — THE one
    spelling shared by ``decode_image_gif`` and
    ``decode_image_gif_planes`` (and mirrored by their SQL oracles); a
    tweak must land on every consumer at once (the _graphshared
    discipline, r13 review)."""
    return [
        (299 * pal[3 * i] + 587 * pal[3 * i + 1] + 114 * pal[3 * i + 2]) // 1000
        for i in range(len(pal) // 3)
    ]


def decode_image_gif(blob: bytes):
    """REAL codec #3 for the image adapter seam: stdlib-only GIF decode —
    container walk, global/local color table, and a full GIF-variant LZW
    decompressor (variable code width, CLEAR/EOI, KwKwK) — the third
    format a curation corpus actually contains, through the exact seam
    PNG and JPEG already ship (``bytes -> (width, height, mean_value,
    name) | None``).

    ``mean_value`` is the mean ITU-R 601-2 integer luma of the
    palette-mapped pixels — ``(299R+587G+114B)//1000``, the one luma
    spelling every decoder in this module shares (decode_image_png).
    Interlaced frames decode identically here because a mean is
    row-order-free; the pass schedule itself is exported
    (``gif_interlace_order``) and round-trip-tested so the support is
    real, not vacuous. Scope: first full-screen frame (animated GIFs →
    poster frame), 2–256-color palettes; anything else returns None and
    the caller's per-blob stand-in takes over — one bad blob never fails
    the Spark stage."""
    parsed = _gif_parse_first_frame(blob)
    if parsed is None:
        return None
    w, h, pal, idx = parsed
    luma = _gif_palette_luma(pal)
    try:
        total = 0
        for i in idx[: w * h]:
            total += luma[i]
    except IndexError:  # index beyond palette: corrupt stream
        return None
    return (w, h, total / (w * h), "gif")


GIF_PLANES_SCHEMA = (
    "id long, width int, height int, pal_luma array<int>, idx array<int>"
)


def decode_image_gif_planes(
    df: DataFrame, id_col: str = "id", blob_col: str = "blob"
) -> DataFrame:
    """Arrow-batched GIF decode to palette-INDEXED planes: blob →
    (id, width, height, per-slot palette lumas, storage-order index
    plane). The GIF counterpart of ``decode_image_rgb_planes``: decode
    is the ONLY Python step, and consumers derive statistics
    RELATIONALLY by indexing ``pal_luma`` with ``idx`` (JVM array
    folds; the registered query exports these planes so its SQL oracle
    recomputes the same stats). ``idx`` is in STORAGE row order — for
    interlaced frames that is the four-pass schedule
    (``gif_interlace_order``), a pure row permutation, so order-free
    statistics (means, histograms, distinct-color counts) need no
    de-interlace. Undecodable blobs are dropped (the per-blob triage
    contract every decoder in this module shares); luma is the shared
    ITU-R 601-2 integer spelling (``decode_image_png``)."""
    ensure_package_on_executors(df.sparkSession)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "width": [], "height": [], "pal_luma": [], "idx": []}
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                parsed = _gif_parse_first_frame(bytes(blob))
                if parsed is None:
                    continue
                w, h, pal, idx = parsed
                luma = _gif_palette_luma(pal)
                n_colors = len(luma)
                if any(px >= n_colors for px in idx[: w * h]):
                    continue  # index beyond palette: corrupt stream
                out["id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["pal_luma"].append(luma)
                out["idx"].append(list(idx[: w * h]))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        extract, schema=GIF_PLANES_SCHEMA
    )


def _pack_lzw_codes(codes: list[int], width: int) -> bytes:
    """LSB-first fixed-width bit packing (the encoder never grows the
    code width — see encode_image_gif); also the test harness's tool for
    hand-crafting variable-width streams one fixed-width segment at a
    time."""
    acc = 0
    nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_image_gif(
    pixels: list[list[int]],
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
) -> bytes:
    """Minimal GIF89a encoder — the encode half of the GIF seam and the
    deterministic blob source for the decoder's tests (the
    encode_image_jpeg_baseline pattern): one full-screen frame of
    palette indices, global color table, and the classic
    "uncompressed LZW" stream (a CLEAR before every pixel code keeps the
    dictionary at its roots, so every code is min_code_size+1 bits wide —
    a valid stream any conformant decoder accepts). ``interlace=True``
    writes rows in the four-pass schedule and sets the flag."""
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    if w == 0 or h == 0:
        raise ValueError("encode_image_gif: empty image")
    if any(len(r) != w for r in pixels):
        raise ValueError("encode_image_gif: ragged rows")
    n_colors = len(palette)
    if not 2 <= n_colors <= 256:
        raise ValueError("encode_image_gif: palette must have 2-256 colors")
    if any(not 0 <= px < n_colors for row in pixels for px in row):
        # an out-of-palette index would silently encode a wrong blob (a
        # zero-padded GCT slot reads as black) or an undecodable one (a
        # code past EOI) — as the decoder tests' blob source this must
        # fail at encode time like the shape checks above
        raise ValueError("encode_image_gif: pixel index outside the palette")
    # GCT size field stores 2^(n+1) entries — round up and zero-pad
    gct_bits = max(1, (n_colors - 1).bit_length())
    gct_n = 1 << gct_bits
    min_code = max(2, gct_bits)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (gct_bits - 1))  # GCT present, size field
    out += b"\x00\x00"  # bg index, aspect
    for r, g, b in palette:
        out += bytes((r, g, b))
    out += b"\x00\x00\x00" * (gct_n - n_colors)
    out.append(0x2C)  # image descriptor, full screen
    out += b"\x00\x00\x00\x00" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)
    out.append(min_code)
    rows = gif_interlace_order(h) if interlace else range(h)
    codes: list[int] = []
    for r in rows:
        for px in pixels[r]:
            codes += [clear, px]
    codes.append(eoi)
    data = _pack_lzw_codes(codes, min_code + 1)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _default_image_decoder(blob: bytes):
    """Default decode chain: PIL when importable (absent here) → the
    stdlib PNG decoder → the stdlib DC-only JPEG decoder → the stdlib
    GIF decoder → None (caller falls back to the deterministic
    stand-in). Text-fixture blobs never carry the PNG/JPEG/GIF
    signatures, so the registered query's fake-decoder oracle is
    unaffected by the chain."""
    out = _decode_image_real(blob)
    if out is None:
        out = decode_image_png(blob)
    if out is None:
        out = decode_image_jpeg_dc(blob)
    if out is None:
        out = decode_image_gif(blob)
    return out


def extract_image_features(
    df: DataFrame, id_col: str = "id", blob_col: str = "blob", decoder=None
) -> DataFrame:
    """Image decode + feature extraction (width/height/mean-intensity).

    ``decoder`` is the ADAPTER SEAM: any ``bytes -> (width, height,
    mean_value, name) | None`` callable drops in with zero engine changes
    — same plan, same Arrow batching, same output schema (contract-tested
    in tests/test_multimodal.py). Default chain: PIL when importable
    (absent in this container) → the stdlib PNG decoder
    (``decode_image_png``, REAL and exercisable here) → a DETERMINISTIC
    FAKE (fixed 16×16 "image" whose mean intensity is the blob's mean
    byte value) so the Spark plumbing runs and is verifiable everywhere —
    the fake is what the registered query's DuckDB oracle recomputes
    byte-for-byte (the text-blob fixtures are never valid PNGs)."""

    ensure_package_on_executors(df.sparkSession)
    decode = decoder if decoder is not None else _default_image_decoder

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "width": [], "height": [], "mean_value": [], "decoder": []}
            for id_, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                decoded = decode(b)
                if decoded is None:
                    # deterministic fake: 16x16, mean intensity = mean byte
                    decoded = (16, 16, (sum(b) / len(b)) if b else 0.0, "fake")
                w, h, mean, dec = decoded
                rows["id"].append(id_)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_value"].append(mean)
                rows["decoder"].append(dec)
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(extract, schema=IMAGE_FEATURE_SCHEMA)


RESIZED_SCHEMA = "id long, width int, height int, pixels binary, decoder string"
AUDIO_FEATURE_SCHEMA = "id long, n_samples long, duration_s double, rms double, decoder string"


def _decode_image_pixels_real(blob: bytes):
    """PIL full-pixel path (absent in this container; kept first in the
    chain so a production image works with zero engine changes):
    ``bytes -> (width, height, HxW uint8 luma ndarray, "pil") | None``."""
    Image = _pil_image()
    if Image is None:
        return None
    try:
        import io

        import numpy as np

        img = Image.open(io.BytesIO(blob))
        if img.width * img.height == 0:
            return None
        return (img.width, img.height, np.asarray(img.convert("L")), "pil")
    except Exception:
        return None


def _default_pixel_decoder(blob: bytes):
    """Full-pixel decode chain for the resize seam: PIL when importable
    (absent here) → stdlib PNG pixels → stdlib baseline-JPEG pixels →
    None (caller falls back to the 1-D byte-signal stand-in). The two
    stdlib decoders are REAL and exercisable in this container."""
    out = _decode_image_pixels_real(blob)
    if out is None:
        out = decode_image_png_pixels(blob)
    if out is None:
        out = decode_image_jpeg_pixels(blob)
    return out


def resize_image(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    id_col: str = "id",
    blob_col: str = "blob",
    pixel_decoder=None,
) -> DataFrame:
    """Resize to a fixed grid (the embedding-model preprocessing shape).

    ``pixel_decoder`` is the ADAPTER SEAM (``bytes -> (w, h, HxW uint8
    ndarray, name) | None``; default chain PIL → stdlib PNG → stdlib
    baseline JPEG): decoded planes are AREA-MEAN resampled onto the
    target grid — each target cell averages its integer-boundary source
    box, exact for integral downscale ratios, pixel replication when
    upscaling. Blobs no decoder accepts (the text fixtures) keep the
    DETERMINISTIC STAND-IN — the blob as a 1-D byte signal mean-pooled
    into width×height buckets (tag ``"fake"``, what the registered
    query's oracle replays byte-for-byte) — so the output schema, batch
    shape, and byte budget (w·h per row) are identical on every path."""

    ensure_package_on_executors(df.sparkSession)
    decode_px = pixel_decoder if pixel_decoder is not None else _default_pixel_decoder

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n_px = width * height
        for pdf in batches:
            out = {"id": [], "width": [], "height": [], "pixels": [], "decoder": []}
            for id_, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                decoded = decode_px(b)
                if decoded is not None:
                    _w, _h, plane, dec = decoded
                    src_h, src_w = plane.shape
                    # area-mean via two reduceat passes (rows then
                    # columns) instead of a per-cell Python loop: the
                    # integer-boundary boxes are exactly reduceat's
                    # segments ([y0_j, y0_{j+1}) contiguous when
                    # downscaling; a repeated index degenerates to the
                    # single row a[y0] — the same [y0, y0+1)
                    # replication box the loop used when upscaling).
                    # Box sums of uint8 values are exact in float64, so
                    # the output is bit-identical to the per-cell
                    # slice-mean at any summation order — this is pure
                    # interpreter-dispatch savings (a 224x224 target is
                    # 50k Python iterations per blob the old way).
                    ys = np.arange(height) * src_h // height
                    xs = np.arange(width) * src_w // width
                    cy = np.maximum(ys + 1, np.append(ys[1:], src_h)) - ys
                    cx = np.maximum(xs + 1, np.append(xs[1:], src_w)) - xs
                    pf = plane.astype(np.float64)
                    sums = np.add.reduceat(
                        np.add.reduceat(pf, ys, axis=0), xs, axis=1
                    )
                    grid = np.minimum(
                        255.0, np.rint(sums / (cy[:, None] * cx[None, :]))
                    ).astype(np.uint8)
                    px = grid.tobytes()
                else:
                    dec = "fake"
                    sig = np.frombuffer(b, dtype=np.uint8)
                    if len(sig) >= n_px:
                        step = len(sig) // n_px
                        px = (
                            sig[: n_px * step]
                            .reshape(n_px, step)
                            .mean(axis=1)
                            .astype(np.uint8)
                            .tobytes()
                        )
                    else:  # shorter than the grid → zero-pad
                        px = sig.tobytes() + bytes(n_px - len(sig))
                out["id"].append(id_)
                out["width"].append(width)
                out["height"].append(height)
                out["pixels"].append(px)
                out["decoder"].append(dec)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(resize, schema=RESIZED_SCHEMA)


def decode_audio_wave(blob: bytes):
    """REAL codec for the audio adapter seam: stdlib ``wave`` parses RIFF
    WAV containers (header, sample width, channel count, frame payload) —
    no third-party package needed, so unlike the PIL image path this real
    decode is exercisable in this container (tests/test_multimodal.py).

    ``bytes -> (n_samples, duration_s, rms, name) | None``; returns None
    for non-WAV/truncated bytes or unsupported widths so a mixed corpus
    falls back to the stand-in per blob instead of failing the stage.
    Multi-channel audio is mixed down by per-frame mean; 8-bit PCM is
    zero-centered at 128 per the WAV spec before RMS."""
    import io
    import wave as _wave

    import numpy as np

    try:
        with _wave.open(io.BytesIO(blob)) as w:
            n_frames = w.getnframes()
            rate = w.getframerate()
            width = w.getsampwidth()
            n_ch = w.getnchannels()
            raw = w.readframes(n_frames)
        # explicit little-endian dtypes: WAV PCM payloads are ALWAYS
        # little-endian, but np.int16/int32 are native-endian aliases —
        # a big-endian host would silently decode byte-swapped garbage
        # (wrong rms, no exception, so no fallback)
        dtype = {1: "u1", 2: "<i2", 4: "<i4"}.get(width)
        if dtype is None or n_frames == 0 or rate <= 0:
            return None
        sig = np.frombuffer(raw, dtype=np.dtype(dtype)).astype(np.float64)
        if width == 1:
            sig = sig - 128.0
        sig = sig.reshape(n_frames, n_ch).mean(axis=1)
        return (n_frames, n_frames / rate, float(np.sqrt((sig**2).mean())), "wave")
    except Exception:
        return None


def extract_audio_features(
    df: DataFrame,
    sample_rate: int = 16000,
    id_col: str = "id",
    blob_col: str = "blob",
    decoder=None,
) -> DataFrame:
    """Audio feature extraction: sample count, duration, RMS energy.

    ``decoder`` is the ADAPTER SEAM (same contract as the image path): any
    ``bytes -> (n_samples, duration_s, rms, name) | None`` callable drops
    in with the same plan/schema — ``decode_audio_wave`` is a REAL one.
    Default (None) keeps the deterministic stand-in: the blob read as
    unsigned 8-bit PCM at ``sample_rate``, RMS over the zero-centered
    signal — vectorizable, and what the registered query's oracle
    recomputes byte-for-byte."""

    ensure_package_on_executors(df.sparkSession)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"id": [], "n_samples": [], "duration_s": [], "rms": [], "decoder": []}
            for id_, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                decoded = decoder(b) if decoder is not None else None
                if decoded is None:
                    sig = np.frombuffer(b, dtype=np.uint8).astype(np.float64) - 128.0
                    decoded = (
                        len(sig),
                        len(sig) / sample_rate,
                        float(np.sqrt((sig**2).mean())) if len(sig) else 0.0,
                        "fake",
                    )
                n, dur, rms, dec = decoded
                out["id"].append(id_)
                out["n_samples"].append(n)
                out["duration_s"].append(dur)
                out["rms"].append(rms)
                out["decoder"].append(dec)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(extract, schema=AUDIO_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "id", blob_col: str = "blob"
) -> DataFrame:
    """Frame sampling for video blobs: emit n_frames evenly-spaced chunks
    per blob (1→N mapInPandas, the UDTF shape). Real codecs would seek
    keyframes; the deterministic stand-in slices byte ranges — the
    dataflow (explode factor, schema, batch shape) is identical."""

    ensure_package_on_executors(df.sparkSession)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "frame_idx": [], "frame": []}
            for id_, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                if not b:
                    continue
                # frame i spans [i*len/n, (i+1)*len/n) — genuinely
                # evenly spaced over the WHOLE blob with no dropped tail
                # (a fixed step of len//n leaves up to n-1 tail bytes in
                # no frame and clusters all samples in the prefix).
                for i in range(n_frames):
                    lo = i * len(b) // n_frames
                    hi = (i + 1) * len(b) // n_frames
                    if hi <= lo:
                        continue  # blob shorter than n_frames: skip empties
                    out["id"].append(id_)
                    out["frame_idx"].append(i)
                    out["frame"].append(b[lo:hi])
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(sample, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Baseline JPEG ENCODER (stdlib + numpy) — the fixture/sink half of the
# JPEG seam. Tables are the ITU T.81 Annex K examples (the de-facto
# standard tables every camera/libjpeg default uses).
# ---------------------------------------------------------------------------

_JPEG_STD_QT_LUMA = (
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
)
_JPEG_STD_QT_CHROMA = (
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
)
# (bits-per-length[1..16], symbols) — T.81 tables K.3-K.6
_JPEG_STD_HUFF = {
    (0, 0): (  # DC luma
        (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
        tuple(range(12)),
    ),
    (0, 1): (  # DC chroma
        (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
        tuple(range(12)),
    ),
    (1, 0): (  # AC luma
        (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
        (
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
            0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
            0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
            0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
            0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
            0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
            0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
            0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
            0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
            0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
            0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
            0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
            0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
            0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
            0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ),
    ),
    (1, 1): (  # AC chroma
        (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
        (
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
            0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
            0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
            0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
            0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
            0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
            0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
            0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
            0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
            0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
            0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
            0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
            0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
            0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
            0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
            0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ),
    ),
}


def _huff_encode_table(spec):
    """(bits, symbols) -> {symbol: (code, length)} via the same canonical
    construction the decoder uses — the two sides share T.81 C.2."""
    counts, syms = spec
    table = {}
    code, k = 0, 0
    for bits in range(1, 17):
        for _ in range(counts[bits - 1]):
            table[syms[k]] = (code, bits)
            code += 1
            k += 1
        code <<= 1
    return table


_JPEG_ENC_TABLES = None  # (raster->zigzag map, DC tables, AC tables), lazy


def _jpeg_encode_tables():
    """Pure functions of the module constants, built once (the encoder
    runs per document on the fixture path — rebuilding ~340 Huffman
    symbols per call is waste; same lazy-singleton shape as
    ``_jpeg_idct_matrix``)."""
    global _JPEG_ENC_TABLES
    if _JPEG_ENC_TABLES is None:
        zz = [0] * 64
        for idx, z in enumerate(_JPEG_ZIGZAG):
            zz[z] = idx  # raster -> zigzag position
        _JPEG_ENC_TABLES = (
            tuple(zz),
            (
                _huff_encode_table(_JPEG_STD_HUFF[(0, 0)]),
                _huff_encode_table(_JPEG_STD_HUFF[(0, 1)]),
            ),
            (
                _huff_encode_table(_JPEG_STD_HUFF[(1, 0)]),
                _huff_encode_table(_JPEG_STD_HUFF[(1, 1)]),
            ),
        )
    return _JPEG_ENC_TABLES


def _pad_edge(arr, ph: int, pw: int):
    """Edge/corner-replicate pad a (h, w, ...) array to (ph, pw, ...) —
    the one padding rule the whole encode path uses (plane→8-multiple,
    chroma box-down, MCU block grid)."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    padded = np.empty((ph, pw) + arr.shape[2:], dtype=arr.dtype)
    padded[:h, :w] = arr
    padded[h:, :w] = arr[h - 1 : h, :]
    padded[:h, w:] = arr[:, w - 1 : w]
    padded[h:, w:] = arr[h - 1, w - 1]
    return padded


def jpeg_quantized_blocks(plane, qtab):
    """Forward path per component, exposed for the pixel-exactness test:
    pad the plane to 8-multiples (edge replication), level-shift, 2-D
    DCT each block against the shared basis, quantize by round(F/q).
    Returns (blocks_y, blocks_x, int coefficient array of shape
    (blocks_y, blocks_x, 8, 8))."""
    import numpy as np

    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = _pad_edge(np.asarray(plane, dtype=np.float64), ph, pw)
    m = _jpeg_idct_matrix()
    # the table argument is in NATURAL (raster) order — the Annex K
    # presentation; the encoder zigzag-reorders it for the DQT wire
    q = np.asarray(qtab, dtype=np.float64).reshape(8, 8)
    by, bx = ph // 8, pw // 8
    out = np.empty((by, bx, 8, 8), dtype=np.int64)
    for r in range(by):
        for c in range(bx):
            blk = padded[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] - 128.0
            f = m @ blk @ m.T  # forward DCT (the IDCT basis transposed)
            out[r, c] = np.rint(f / q).astype(np.int64)
    return by, bx, out


def encode_image_jpeg_baseline(
    rgb,
    subsampling: tuple[int, int] = (2, 2),
    _comp_order: tuple[int, int, int] = (1, 2, 3),
) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a baseline JFIF JPEG.

    Fixed, standard choices: Annex K quantization + Huffman tables, one
    interleaved scan, no restart markers, chroma subsampled by box mean
    at ``subsampling`` = Y's (h, v) factors ((2, 2) = 4:2:0, (1, 1) =
    4:4:4). Exists for two consumers: deterministic fixture generation
    for the decoder's pixel-exactness tests (the coefficient stream is
    reproducible arithmetic, so the expected decode is independently
    computable with numpy), and the encode half of the image sink seam.

    ``_comp_order``: a permutation of (1, 2, 3) giving the component
    DECLARATION order in SOF/SOS (and hence the scan interleave). T.81
    allows any order; JFIF files use (1, 2, 3). Exists so the decoder's
    match-components-by-ID behavior is testable against a spec-legal
    permuted stream.
    """
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    if not (0 < h <= 65535 and 0 < w <= 65535):
        # the SOF dimension fields are 16-bit — fail before any DCT work
        # instead of an opaque OverflowError at segment-write time
        raise ValueError(
            f"encode_image_jpeg_baseline: dimensions {w}x{h} outside "
            "JPEG's 1..65535 limit"
        )
    if sorted(_comp_order) != [1, 2, 3]:
        raise ValueError("_comp_order must be a permutation of (1, 2, 3)")
    hs, vs = subsampling
    # forward BT.601 full-range (JFIF)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    def box_down(p):
        if hs == 1 and vs == 1:
            return p
        padded = _pad_edge(p, -(-h // vs) * vs, -(-w // hs) * hs)
        ph, pw = padded.shape
        return padded.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))

    # component id -> (plane, quant table, quant-table id / Huffman class,
    # sampling factors); JFIF semantics are fixed per ID, declaration
    # order comes from _comp_order
    comp_specs = {
        1: (y, _JPEG_STD_QT_LUMA, 0, hs, vs),
        2: (box_down(cb), _JPEG_STD_QT_CHROMA, 1, 1, 1),
        3: (box_down(cr), _JPEG_STD_QT_CHROMA, 1, 1, 1),
    }
    mcus_x, mcus_y = -(-w // (8 * hs)), -(-h // (8 * vs))
    comp_blocks = []
    for cid in _comp_order:
        plane, qtab, _tix, ch, cv = comp_specs[cid]
        by, bx, blocks = jpeg_quantized_blocks(plane, qtab)
        # pad the block grid to the MCU grid (edge-block replication)
        gy, gx = mcus_y * cv, mcus_x * ch
        if by < gy or bx < gx:
            blocks = _pad_edge(blocks, gy, gx)
        comp_blocks.append(blocks)

    bits: list[int] = []

    def put(code: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            bits.append((code >> i) & 1)

    def mag(v: int) -> tuple[int, int]:
        # size category + raw bits (T.81 F.1.2.1): negatives as v-1
        if v == 0:
            return 0, 0
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        return t, v if v > 0 else v + (1 << t) - 1

    zz, dc_tables, ac_tables = _jpeg_encode_tables()
    pred = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, blocks in enumerate(comp_blocks):
                cid = _comp_order[ci]
                _pl, _qt, tix, ch, cv = comp_specs[cid]
                dct, act = dc_tables[tix], ac_tables[tix]
                for bv in range(cv):
                    for bh in range(ch):
                        blk = blocks[my * cv + bv, mx * ch + bh]
                        seq = [0] * 64
                        for rr in range(8):
                            for cc in range(8):
                                seq[zz[rr * 8 + cc]] = int(blk[rr, cc])
                        t, raw = mag(seq[0] - pred[ci])
                        pred[ci] = seq[0]
                        code, n = dct[t]
                        put(code, n)
                        if t:
                            put(raw, t)
                        run = 0
                        for k in range(1, 64):
                            if seq[k] == 0:
                                run += 1
                                continue
                            while run >= 16:
                                code, n = act[0xF0]
                                put(code, n)
                                run -= 16
                            t, raw = mag(seq[k])
                            code, n = act[(run << 4) | t]
                            put(code, n)
                            put(raw, t)
                            run = 0
                        if run:
                            code, n = act[0x00]
                            put(code, n)
    # byte-pack with 1-padding and 0xFF stuffing
    while len(bits) % 8:
        bits.append(1)
    entropy = bytearray()
    for i in range(0, len(bits), 8):
        v = 0
        for bit in bits[i : i + 8]:
            v = (v << 1) | bit
        entropy.append(v)
        if v == 0xFF:
            entropy.append(0x00)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)

    # DQT payloads are ZIGZAG-ordered on the wire (T.81 B.2.4.1); the
    # module constants are the natural-order Annex K presentation
    seg(0xDB, bytes([0x00]) + bytes(_JPEG_STD_QT_LUMA[z] for z in _JPEG_ZIGZAG))
    seg(0xDB, bytes([0x01]) + bytes(_JPEG_STD_QT_CHROMA[z] for z in _JPEG_ZIGZAG))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid in _comp_order:
        _pl, _qt, tix, ch, cv = comp_specs[cid]
        sof += bytes([cid, (ch << 4) | cv, tix])
    seg(0xC0, bytes(sof))
    for (tc, th), (counts, syms) in _JPEG_STD_HUFF.items():
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms))
    sos = bytearray([3])
    for cid in _comp_order:
        tix = comp_specs[cid][2]
        sos += bytes([cid, (tix << 4) | tix])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))
    out.extend(entropy)
    out.extend(b"\xff\xd9")
    return bytes(out)


RGB_PLANES_SCHEMA = (
    "id long, width int, height int, "
    "r array<int>, g array<int>, b array<int>"
)


def decode_image_rgb_planes(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "blob",
    decoder=None,
) -> DataFrame:
    """Arrow-batched full-COLOR decode: blob → (id, width, height, three
    row-major channel planes as int arrays). The color counterpart of
    ``extract_image_features``'s gray seam: the decode chain is
    ``decode_image_jpeg_rgb`` (stdlib baseline JPEG, chroma
    reconstructed + inverse BT.601) with the same per-blob fallback
    contract — undecodable blobs are dropped (the triage path for a
    mixed corpus keeps gray features for them instead).

    Decode once, THEN derive statistics relationally: consumers compute
    channel stats from these planes with JVM array folds (and the
    registered query exports them so its oracle recomputes the same
    stats in SQL) — the decode is the only Python step. Pixel
    correctness of the decode itself is pinned by the encoder-fixture
    tests in tests/test_multimodal.py."""
    ensure_package_on_executors(df.sparkSession)
    dec = decoder or decode_image_jpeg_rgb

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "width": [], "height": [], "r": [], "g": [], "b": []}
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                got = dec(bytes(blob))
                if got is None:
                    continue
                w, h, px, _name = got
                out["id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["r"].append(px[:, :, 0].reshape(-1).astype("int32"))
                out["g"].append(px[:, :, 1].reshape(-1).astype("int32"))
                out["b"].append(px[:, :, 2].reshape(-1).astype("int32"))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        extract, schema=RGB_PLANES_SCHEMA
    )
