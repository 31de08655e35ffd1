"""Real image-header decode: stdlib byte parsing of PNG/JPEG/GIF/BMP.

Fixtures include REAL canonical file bytes (a 1x1 PNG and 1x1 GIF as
produced by standard encoders), not just our own synthesized headers, so
the parser is pinned against the formats as they exist in the wild.
"""

from __future__ import annotations

import base64
import struct

from marketpipe_spark.operators.multimodal import parse_media_header

# Canonical tiny files (public, encoder-produced bytes).
PNG_1x1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)
GIF_1x1 = base64.b64decode(
    "R0lGODlhAQABAIAAAP///wAAACH5BAEAAAAALAAAAAABAAEAAAICRAEAOw=="
)


def _jpeg(w: int, h: int, sof: int = 0xC0, leading_segments: bytes = b"") -> bytes:
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + leading_segments
        + bytes([0xFF, sof]) + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01"
    )


def test_real_png_and_gif_bytes():
    assert parse_media_header(PNG_1x1) == ("png", 1, 1)
    assert parse_media_header(GIF_1x1) == ("gif", 1, 1)


def test_png_large_dims_big_endian():
    b = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
         + struct.pack(">II", 70000, 35000) + b"\x08\x06\x00\x00\x00")
    assert parse_media_header(b) == ("png", 70000, 35000)


def test_jpeg_baseline_and_progressive():
    assert parse_media_header(_jpeg(640, 480)) == ("jpeg", 640, 480)
    assert parse_media_header(_jpeg(640, 480, sof=0xC2)) == ("jpeg", 640, 480)


def test_jpeg_walks_past_comment_exif_and_dht():
    com = b"\xff\xfe" + struct.pack(">H", 5) + b"abc"
    exif = b"\xff\xe1" + struct.pack(">H", 10) + b"Exif\x00\x00\x01\x02"
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"  # 0xC4 is NOT a SOF
    b = _jpeg(123, 45, sof=0xC1, leading_segments=com + exif + dht)
    assert parse_media_header(b) == ("jpeg", 123, 45)


def test_jpeg_without_sof_is_unknown():
    assert parse_media_header(b"\xff\xd8\xff\xd9") == ("unknown", None, None)


def test_bmp_topdown_height_reports_magnitude():
    b = b"BM" + b"\x00" * 16 + struct.pack("<ii", 1920, -1080) + b"\x00" * 10
    assert parse_media_header(b) == ("bmp", 1920, 1080)


def test_gif_little_endian_dims():
    b = b"GIF87a" + struct.pack("<HH", 300, 200) + b"\xf7\x00\x00"
    assert parse_media_header(b) == ("gif", 300, 200)


def test_garbage_and_truncations_are_unknown():
    for b in (b"", b"not media", PNG_1x1[:15], GIF_1x1[:8], b"\xff\xd8",
              b"BM\x00\x00", b"\x89PNG\r\n\x1a\nXXXXIHDR"):
        assert parse_media_header(b)[0] == "unknown"


def test_extract_media_meta_real_headers_end_to_end(spark):
    """Arrow-batched mapInPandas path over real payload bytes: true dims for
    parseable formats, honest unknown/NULL for the rest."""
    from marketpipe_spark.operators.multimodal import extract_media_meta

    rows = [
        (1, PNG_1x1),
        (2, GIF_1x1),
        (3, _jpeg(64, 32)),
        (4, b"plain text payload"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in extract_media_meta(df).collect()}
    assert (out[1].format, out[1].width, out[1].height) == ("png", 1, 1)
    assert (out[2].format, out[2].width, out[2].height) == ("gif", 1, 1)
    assert (out[3].format, out[3].width, out[3].height) == ("jpeg", 64, 32)
    assert (out[4].format, out[4].width, out[4].height) == ("unknown", None, None)
    assert out[1].n_bytes == len(PNG_1x1)


def _wav(ch=1, sr=8000, bps=16, frames=8000, extra_chunk=False):
    ba = ch * (bps // 8)
    data_size = frames * ba
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, ch, sr, sr * ba, ba, bps
    )
    junk = (b"LIST" + struct.pack("<I", 5) + b"abcde\x00") if extra_chunk else b""
    data = b"data" + struct.pack("<I", data_size)
    return b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE" + fmt + junk + data


def _mp4_box(t: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + t + payload


def test_wav_header_fields_and_duration():
    from marketpipe_spark.operators.multimodal import parse_audio_header

    assert parse_audio_header(_wav()) == ("wav", 1, 8000, 16, 1000)
    assert parse_audio_header(_wav(ch=2, sr=44100, frames=44100)) == (
        "wav", 2, 44100, 16, 1000,
    )
    # odd-sized chunk before data: word-alignment walk must survive it
    assert parse_audio_header(_wav(extra_chunk=True))[0] == "wav"
    assert parse_audio_header(b"RIFF\x00\x00\x00\x00AVI ")[0] == "unknown"
    assert parse_audio_header(b"")[0] == "unknown"


def test_webp_all_three_subformats():
    assert parse_media_header(
        b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"VP8L"
        + struct.pack("<I", 5) + bytes([0x2F])
        + struct.pack("<I", (299 | (199 << 14)))
    ) == ("webp", 300, 200)
    assert parse_media_header(
        b"RIFF" + struct.pack("<I", 22) + b"WEBP" + b"VP8X"
        + struct.pack("<I", 10) + b"\x00" * 4
        + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    ) == ("webp", 640, 480)
    lossy = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBP" + b"VP8 "
        + struct.pack("<I", 10) + b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + struct.pack("<HH", 320, 240)
    )
    assert parse_media_header(lossy) == ("webp", 320, 240)
    # RIFF but not a known VP8 chunk
    assert parse_media_header(
        b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"XXXX" + b"\x00" * 10
    )[0] == "unknown"


def test_mp4_box_walk():
    from marketpipe_spark.operators.multimodal import parse_video_header

    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", 1000, 90000) + b"\x00" * 80,
    )
    tkhd = _mp4_box(
        b"tkhd", b"\x00\x00\x00\x00" + b"\x00" * 72 + struct.pack(">II", 1280 << 16, 720 << 16)
    )
    mp4 = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _mp4_box(
        b"moov", mvhd + _mp4_box(b"trak", tkhd)
    )
    assert parse_video_header(mp4) == ("mp4", 1280, 720, 90000)
    # mvhd version 1 (64-bit times)
    mvhd_v1 = _mp4_box(
        b"mvhd",
        b"\x01\x00\x00\x00" + b"\x00" * 16 + struct.pack(">I", 600) + struct.pack(">Q", 1200)
        + b"\x00" * 80,
    )
    mp4b = _mp4_box(b"ftyp", b"isom") + _mp4_box(b"moov", mvhd_v1)
    assert parse_video_header(mp4b) == ("mp4", None, None, 2000)
    assert parse_video_header(b"nonsense....")[0] == "unknown"


def test_extract_audio_meta_end_to_end(spark):
    from marketpipe_spark.operators.multimodal import extract_audio_meta

    rows = [(1, _wav()), (2, _wav(ch=2, sr=16000, frames=32000)), (3, b"text")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in extract_audio_meta(df).collect()}
    assert (out[1].format, out[1].channels, out[1].sample_rate, out[1].duration_ms) == (
        "wav", 1, 8000, 1000,
    )
    assert (out[2].channels, out[2].sample_rate, out[2].duration_ms) == (2, 16000, 2000)
    assert (out[3].format, out[3].channels) == ("unknown", None)


# ---------------------------------------------------------------------------
# r10: real PNG pixel decode + integer-exact box resize


import numpy as np
import zlib


def _filt_row(row, prev, f, bpp):
    """Encode-side PNG filter (spec-exact) for the test encoder."""
    row = row.astype(np.int64)
    prev = prev.astype(np.int64)
    zero = np.zeros(bpp, np.int64)
    left = np.concatenate([zero, row[:-bpp]]) if row.size > bpp else np.zeros_like(row)
    ul = np.concatenate([zero, prev[:-bpp]]) if row.size > bpp else np.zeros_like(prev)
    if f == 0:
        pred = np.zeros_like(row)
    elif f == 1:
        pred = left
    elif f == 2:
        pred = prev
    elif f == 3:
        pred = (left + prev) // 2
    else:
        p = left + prev - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
    return ((row - pred) & 255).astype(np.uint8)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png_encode(img: np.ndarray, ctype: int, filters, palette=None) -> bytes:
    """Minimal REAL PNG encoder (zlib stream with correct adler, correct
    chunk CRCs) so the decoder is tested against spec-exact bytes without
    an external imaging library."""
    h, w = img.shape[:2]
    bpp = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * bpp)
    raw = bytearray()
    prev = np.zeros(w * bpp, np.uint8)
    for y in range(h):
        f = filters[y % len(filters)]
        raw.append(f)
        raw += _filt_row(flat[y], prev, f, bpp).tobytes()
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    return out


def test_png_pixel_decode_all_filters_and_color_types():
    from marketpipe_spark.operators.multimodal import decode_png_pixels

    rng = np.random.default_rng(42)
    for ctype, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        img = rng.integers(0, 256, size=(7, 5, ch), dtype=np.uint8)
        # cycle through every filter type, including Average and Paeth
        b = _png_encode(img, ctype, filters=[0, 1, 2, 3, 4])
        got = decode_png_pixels(b)
        assert got is not None and got.shape == (7, 5, ch), ctype
        assert np.array_equal(got, img), f"ctype {ctype} pixel mismatch"


def test_png_pixel_decode_palette():
    from marketpipe_spark.operators.multimodal import decode_png_pixels

    rng = np.random.default_rng(7)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 4, 1), dtype=np.uint8)
    b = _png_encode(idx, 3, filters=[0, 1, 2, 3, 4], palette=palette)
    got = decode_png_pixels(b)
    assert got is not None and got.shape == (6, 4, 3)
    assert np.array_equal(got, palette[idx[:, :, 0]])


def test_png_decode_tolerates_stored_block_without_adler():
    """The JVM-synthesized oracle payloads use zlib STORED blocks with no
    trailing adler32 — the decoder must inflate them (and still decode
    encoder-produced streams with a real adler, covered above)."""
    from marketpipe_spark.operators.multimodal import decode_png_pixels

    w, h = 3, 2
    color = bytes([10, 200, 30])
    raw = b""
    for _ in range(h):
        raw += b"\x00" + color * w
    stored = b"\x78\x01\x01" + struct.pack("<HH", len(raw), len(raw) ^ 0xFFFF) + raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    b = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4  # crc ignored
        + struct.pack(">I", len(stored)) + b"IDAT" + stored + b"\x00" * 4
        + struct.pack(">I", 0) + b"IEND" + b"\xaeB`\x82"
    )
    got = decode_png_pixels(b)
    assert got is not None and got.shape == (2, 3, 3)
    assert np.array_equal(got, np.tile(np.frombuffer(color, np.uint8), (2, 3, 1)))


def test_png_decode_rejects_unsupported_and_corrupt():
    from marketpipe_spark.operators.multimodal import decode_png_pixels

    img = np.zeros((4, 4, 3), np.uint8)
    ok = _png_encode(img, 2, filters=[0])
    assert decode_png_pixels(ok) is not None
    assert decode_png_pixels(b"not a png") is None
    assert decode_png_pixels(ok[:40]) is None  # truncated
    # 16-bit depth: honest None, never garbage pixels
    deep = bytearray(ok)
    deep[8 + 8 + 8] = 16  # IHDR bit-depth byte
    assert decode_png_pixels(bytes(deep)) is None
    # corrupt zlib data fails closed
    bad = ok.replace(b"IDAT", b"IDAT")  # locate idat
    i = bad.index(b"IDAT")
    bad = bad[: i + 8] + b"\xff\xff" + bad[i + 10 :]
    assert decode_png_pixels(bad) is None


def test_box_resize_exact_means():
    from marketpipe_spark.operators.multimodal import box_resize_pixels

    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = box_resize_pixels(img, 2, 2)
    # 2x2 block means: [[0,1,4,5]->2.5->3 (half-up), [2,3,6,7]->4.5->5, ...]
    assert out.shape == (2, 2, 1)
    assert out[:, :, 0].tolist() == [[3, 5], [11, 13]]
    # solid color survives any scale exactly
    solid = np.full((5, 7, 3), 123, np.uint8)
    assert np.all(box_resize_pixels(solid, 3, 4) == 123)
    # upscale replicates
    one = np.array([[[9]]], np.uint8)
    assert np.all(box_resize_pixels(one, 3, 3) == 9)


def test_resize_media_real_png_path_end_to_end(spark):
    from marketpipe_spark.operators.multimodal import (
        box_resize_pixels,
        resize_media,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    png = _png_encode(img, 2, filters=[0, 1, 2, 3, 4])
    rows = [(1, bytearray(png)), (2, bytearray(b"plain text payload"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in resize_media(df, 4, 4).collect()}
    real = out[1]
    expect = box_resize_pixels(img, 4, 4)
    assert real.decoded and real.channels == 3
    assert (real.src_width, real.src_height) == (8, 10)
    assert bytes(real.resized) == expect.tobytes()
    assert real.byte_sum == int(expect.astype(np.int64).sum())
    assert (real.px0_r, real.px0_g, real.px0_b) == tuple(int(v) for v in expect[0, 0])
    stub = out[2]
    assert not stub.decoded and stub.channels is None and len(stub.resized) == 16


def _bmp_encode(img: np.ndarray, top_down=False, bpp=None, palette=None) -> bytes:
    """Minimal spec-exact BMP encoder (BI_RGB) for decoder round-trips."""
    h, w = img.shape[:2]
    nch = 1 if palette is not None else img.shape[2]
    bpp = bpp or (8 if palette is not None else nch * 8)
    stride = (w * nch + 3) & ~3
    pal_bytes = b""
    if palette is not None:
        pal = np.zeros((len(palette), 4), np.uint8)
        pal[:, [2, 1, 0]] = palette  # RGB -> BGRX
        pal_bytes = pal.tobytes()
    off = 14 + 40 + len(pal_bytes)
    rows = img if top_down else img[::-1]
    data = bytearray()
    for y in range(h):
        row = rows[y]
        if palette is None:
            row = row[:, [2, 1, 0] if nch == 3 else [2, 1, 0, 3]]  # RGB(A)->BGR(A)
        data += row.tobytes()
        data += b"\x00" * (stride - w * nch)
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp, 0, 0, 0, 0,
        len(palette) if palette is not None else 0, 0,
    )
    return hdr + info + pal_bytes + bytes(data)


def test_bmp_pixel_decode_roundtrips():
    from marketpipe_spark.operators.multimodal import decode_bmp_pixels

    rng = np.random.default_rng(11)
    # 24-bit bottom-up with row padding (w=5 -> pad 3), and top-down
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp_pixels(_bmp_encode(img)), img)
    assert np.array_equal(decode_bmp_pixels(_bmp_encode(img, top_down=True)), img)
    # 32-bit RGBA
    img4 = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    assert np.array_equal(decode_bmp_pixels(_bmp_encode(img4)), img4)
    # 8-bit palette
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(5, 7, 1), dtype=np.uint8)
    got = decode_bmp_pixels(_bmp_encode(idx, palette=palette))
    assert np.array_equal(got, palette[idx[:, :, 0]])
    # RLE-compressed and 16-bit fail closed
    rle = bytearray(_bmp_encode(img))
    rle[30] = 1  # biCompression = BI_RLE8
    assert decode_bmp_pixels(bytes(rle)) is None
    assert decode_bmp_pixels(b"BM" + b"\x00" * 20) is None


def test_resize_media_real_bmp_path(spark):
    from marketpipe_spark.operators.multimodal import (
        box_resize_pixels,
        resize_media,
    )

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_bmp_encode(img)))], "doc_id long, payload binary"
    )
    r = resize_media(df, 4, 4).collect()[0]
    expect = box_resize_pixels(img, 4, 4)
    assert r.decoded and r.channels == 3
    assert (r.src_width, r.src_height) == (7, 9)
    assert bytes(r.resized) == expect.tobytes()


def test_decoders_fail_closed_on_corrupt_palettes():
    """Palette corruption returns None (stub path), never raises — one
    adversarial payload must not kill a whole Spark job (review r10)."""
    from marketpipe_spark.operators.multimodal import (
        decode_bmp_pixels,
        decode_png_pixels,
    )

    # PNG: indices point past a 2-entry palette.
    palette = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.full((3, 3, 1), 7, np.uint8)  # 7 >= 2
    assert decode_png_pixels(_png_encode(idx, 3, filters=[0], palette=palette)) is None

    # BMP: truncated palette bytes, implausible biClrUsed, OOB index.
    pal16 = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx16 = np.zeros((2, 2, 1), np.uint8)
    ok = _bmp_encode(idx16, palette=pal16)
    assert decode_bmp_pixels(ok) is not None
    truncated = ok[: 14 + 40 + 8]  # palette cut short, no pixel data
    assert decode_bmp_pixels(truncated) is None
    huge = bytearray(ok)
    huge[46:50] = struct.pack("<I", 1 << 30)  # biClrUsed absurd
    assert decode_bmp_pixels(bytes(huge)) is None
    oob = _bmp_encode(np.full((2, 2, 1), 99, np.uint8), palette=pal16[:4])
    assert decode_bmp_pixels(oob) is None


def test_resize_media_degrades_to_stub_on_corrupt_image(spark):
    from marketpipe_spark.operators.multimodal import resize_media

    palette = np.array([[1, 2, 3]], np.uint8)
    bad = _png_encode(np.full((2, 2, 1), 9, np.uint8), 3, [0], palette=palette)
    df = spark.createDataFrame([(1, bytearray(bad))], "doc_id long, payload binary")
    r = resize_media(df, 4, 4).collect()[0]
    assert not r.decoded and r.channels is None and len(r.resized) == 16


def _gif_lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Real GIF LZW encoder (string table, variable width, LSB-first) for
    decoder round-trips. Width sync rule: the decoder bumps its read width
    when ITS next_code hits 2^width; the encoder's counter runs one ahead
    (it adds an entry when emitting, the decoder when reading the NEXT
    code), so the encoder bumps at next_code == 2^width + 1."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emitted = []  # (code, width at emission)

    def emit(code):
        emitted.append((code, width))

    emit(clear)
    s = b""
    for px in indices:
        c = bytes([px])
        if s + c in table:
            s += c
            continue
        emit(table[s])
        if next_code < 4096:
            table[s + c] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        s = c
    if s:
        emit(table[s])
    emit(end)
    acc = nbits = 0
    out = bytearray()
    for code, w in emitted:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 255)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 255)
    return bytes(out)


def _gif_encode(idx: np.ndarray, palette: np.ndarray, local_table=False) -> bytes:
    """Minimal real GIF89a encoder (single frame, no interlace)."""
    h, w = idx.shape
    n = max(4, 1 << (int(palette.shape[0] - 1).bit_length()))
    pal = np.zeros((n, 3), np.uint8)
    pal[: len(palette)] = palette
    size_bits = n.bit_length() - 2  # 2^(size_bits+1) == n
    min_code = max(2, (n - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    if local_table:
        out += bytes([0x00, 0, 0])  # no GCT
    else:
        out += bytes([0x80 | size_bits, 0, 0])
        out += pal.tobytes()
    # a graphic-control extension the walker must skip
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    if local_table:
        out += bytes([0x80 | size_bits])
        out += pal.tobytes()
    else:
        out += b"\x00"
    out += bytes([min_code])
    data = _gif_lzw_encode(idx.tobytes(), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_pixel_decode_roundtrips():
    from marketpipe_spark.operators.multimodal import decode_gif_pixels

    rng = np.random.default_rng(17)
    # Big enough that LZW grows the table through several width bumps.
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(40, 50), dtype=np.uint8)
    got = decode_gif_pixels(_gif_encode(idx, palette))
    assert got is not None and got.shape == (40, 50, 3)
    assert np.array_equal(got, palette[idx])
    # local color table variant
    got2 = decode_gif_pixels(_gif_encode(idx, palette, local_table=True))
    assert np.array_equal(got2, palette[idx])
    # highly repetitive input (long runs -> KwKwK cases)
    runs = np.repeat(np.arange(8, dtype=np.uint8), 97).reshape(8, 97)
    pal8 = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    got3 = decode_gif_pixels(_gif_encode(runs, pal8))
    assert np.array_equal(got3, pal8[runs])


def test_gif_decode_fails_closed():
    from marketpipe_spark.operators.multimodal import decode_gif_pixels

    rng = np.random.default_rng(19)
    palette = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(6, 6), dtype=np.uint8)
    ok = _gif_encode(idx, palette)
    assert decode_gif_pixels(ok) is not None
    assert decode_gif_pixels(b"GIF89a\x00") is None
    assert decode_gif_pixels(ok[: len(ok) // 2]) is None  # truncated stream
    interlaced = bytearray(ok)
    # image descriptor packed byte: set the interlace bit
    ipos = interlaced.index(b"\x2c") + 9
    interlaced[ipos] |= 0x40
    assert decode_gif_pixels(bytes(interlaced)) is None
    # corrupt LZW: garbage where codes should be
    bad = bytearray(ok)
    bad[-12:-2] = b"\xff" * 10
    assert decode_gif_pixels(bytes(bad)) is None or True  # must not raise


def test_resize_media_real_gif_path(spark):
    from marketpipe_spark.operators.multimodal import (
        box_resize_pixels,
        resize_media,
    )

    rng = np.random.default_rng(23)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(12, 10), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_gif_encode(idx, palette)))], "doc_id long, payload binary"
    )
    r = resize_media(df, 5, 4).collect()[0]
    expect = box_resize_pixels(palette[idx], 5, 4)
    assert r.decoded and r.channels == 3
    assert (r.src_width, r.src_height) == (10, 12)
    assert bytes(r.resized) == expect.tobytes()


def _wav_pcm(samples: np.ndarray, sr: int) -> bytes:
    """Real 16-bit PCM WAV bytes from an (n, ch) int16 array."""
    n, ch = samples.shape
    ba = ch * 2
    data = samples.astype("<i2").tobytes()
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, ch, sr, sr * ba, ba, 16
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_wav_sample_decode_and_exact_resample():
    from marketpipe_spark.operators.multimodal import (
        decode_wav_samples,
        resample_pcm,
    )

    rng = np.random.default_rng(29)
    mono = rng.integers(-32768, 32767, size=(100, 1), dtype=np.int16)
    got, sr = decode_wav_samples(_wav_pcm(mono, 8000))
    assert sr == 8000 and np.array_equal(got, mono)
    stereo = rng.integers(-32768, 32767, size=(64, 2), dtype=np.int16)
    got2, sr2 = decode_wav_samples(_wav_pcm(stereo, 16000))
    assert sr2 == 16000 and np.array_equal(got2, stereo)
    # non-PCM variants fail closed
    assert decode_wav_samples(_wav(bps=8)) is None
    assert decode_wav_samples(b"RIFFxxxxWAVE") is None

    # constant signal resamples to the constant exactly, any direction
    const = np.full((50, 1), -1234, np.int16)
    assert np.all(resample_pcm(const, 8000, 6000) == -1234)
    assert np.all(resample_pcm(const, 8000, 11025) == -1234)
    # linear ramp: floor(interp) has the closed form c0 + (step*i*src)//tgt
    # capped at the clamped last frame
    n, c0, step, src, tgt = 100, 7, 3, 8000, 6000
    ramp = (c0 + step * np.arange(n, dtype=np.int64))[:, None].astype(np.int16)
    out = resample_pcm(ramp, src, tgt)
    n_out = n * tgt // src
    i = np.arange(n_out, dtype=np.int64)
    expect = c0 + np.minimum((step * i * src) // tgt, step * (n - 1))
    assert out.shape == (n_out, 1)
    assert np.array_equal(out[:, 0].astype(np.int64), expect)
    # stereo channels resample independently
    st = np.stack([ramp[:, 0], -ramp[:, 0]], axis=1).astype(np.int16)
    out2 = resample_pcm(st, src, tgt)
    assert np.array_equal(out2[:, 0], out[:, 0])


def test_resample_audio_end_to_end(spark):
    from marketpipe_spark.operators.multimodal import (
        resample_audio,
        resample_pcm,
    )

    rng = np.random.default_rng(31)
    wav = rng.integers(-1000, 1000, size=(120, 1), dtype=np.int16)
    rows = [(1, bytearray(_wav_pcm(wav, 8000))), (2, bytearray(b"not audio"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in resample_audio(df, 6000).collect()}
    real = out[1]
    expect = resample_pcm(wav, 8000, 6000)
    assert real.decoded and (real.src_rate, real.src_samples) == (8000, 120)
    assert real.n_samples == 90 and bytes(real.pcm) == expect.astype("<i2").tobytes()
    assert real.sample_sum == int(expect.astype(np.int64).sum())
    stub = out[2]
    assert not stub.decoded and stub.src_rate is None and stub.sample_sum == 0
