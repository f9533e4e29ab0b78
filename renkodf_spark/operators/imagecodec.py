"""Pure-stdlib image codecs: PNG / BMP decode, GIF frame decode, plus
matching encoders for deterministic fixtures.

This closes the two long-standing env-blocked contracts in
``multimodal.py`` (pixel decode, frame sampling) WITHOUT new
dependencies: PNG needs only ``zlib`` (stdlib) plus the five scanline
filters, BMP is raw bytes with padding, GIF is self-contained LZW,
baseline JPEG is Huffman + an 8x8 IDCT (numpy matmul), PCM WAV and
uncompressed AVI are RIFF walks — all implementable from the public
specs (PNG: RFC 2083 / W3C spec §6 filters; BMP: BITMAPINFOHEADER;
GIF: GIF89a appendix F LZW; JPEG: ITU T.81 baseline; RIFF/AVI: the
MS container docs).

Scope (documented, test-pinned):
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette→RGB),
  4 (gray+alpha), 6 (RGBA); no interlace (Adam7 rejected cleanly).
- BMP: BI_RGB uncompressed, 8-bit palette / 24-bit / 32-bit, bottom-up
  and top-down rows, 4-byte row padding.
- GIF: 87a/89a, global+local palettes, variable-width LZW with dict
  reset, interlaced frames, multi-frame with per-frame delay (frames
  are decoded as their own rects — no disposal compositing, which is
  animation RENDERING, not data extraction).
- JPEG: baseline sequential (SOF0/1), table-driven Huffman from the
  file's own DHT, 4:4:4/4:2:2/4:2:0 with nearest upsample, restart
  intervals; progressive/arithmetic/12-bit raise ValueError.
- WAV: 16-bit integer PCM, chunk walk skips unknown chunks.
- AVI: uncompressed 24-bit 'DIB ' streams; compressed fourccs raise
  (the genuine ffmpeg boundary).

The encoders exist so fixtures are self-made and deterministic: the
gate queries synthesize payloads whose pixels follow a closed-form
``(seed + 3x + 7y + 11c) mod 256`` formula, so a DuckDB oracle can
recompute decoded pixel statistics algebraically without ever parsing
a byte — the decode path is oracle-gated end to end.

Per-row cost: decoding is a per-payload Python loop hosted in
mapInPandas Arrow batches (the multimodal plumbing); at 100 TB the
shape is embarrassingly parallel with no shuffle, and the hot loops
(unfilter, LZW) are O(bytes) with bytearray arithmetic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ----------------------------------------------------------------- PNG

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, *, palette: np.ndarray | None = None) -> bytes:
    """Encode an (h, w) or (h, w, ch) uint8 array as a valid PNG.

    Per-row filter type = row_index % 5, so a round-trip exercises every
    unfilter branch. With ``palette`` given, ``arr`` must be (h, w)
    palette indices and a color-type-3 PNG is written."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if palette is not None:
        if ch != 1:
            raise ValueError("palette PNG takes (h, w) index arrays")
        color_type = 3
    else:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch
    stride = w * ch
    raw = arr.reshape(h, stride)
    out = bytearray()
    prev = bytes(stride)
    for y in range(h):
        cur = raw[y].tobytes()
        f = y % 5
        out.append(f)
        if f == 0:
            out += cur
        elif f == 1:  # Sub
            out += bytes((cur[i] - (cur[i - bpp] if i >= bpp else 0)) & 0xFF for i in range(stride))
        elif f == 2:  # Up
            out += bytes((cur[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:  # Average
            out += bytes(
                (cur[i] - (((cur[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            out += bytes(
                (
                    cur[i]
                    - _paeth(
                        cur[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _png_chunk(b"PLTE", np.ascontiguousarray(palette, dtype=np.uint8).tobytes())
    body += _png_chunk(b"IDAT", zlib.compress(bytes(out)))
    body += _png_chunk(b"IEND", b"")
    return body


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG into an (h, w, channels) uint8 array (palette
    images expand to RGB). Raises ValueError on non-PNG input or
    features outside the documented scope (bit depth != 8, Adam7)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    i, n = 8, len(data)
    ihdr = None
    plte = None
    idat = bytearray()
    while i + 8 <= n:
        (ln,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + ln]
        i += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if interlace != 0:
        raise ValueError("unsupported PNG interlace (Adam7)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        cur = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i2 in range(ch, stride):
                cur[i2] = (cur[i2] + cur[i2 - ch]) & 0xFF
        elif f == 2:  # Up
            for i2 in range(stride):
                cur[i2] = (cur[i2] + prev[i2]) & 0xFF
        elif f == 3:  # Average
            for i2 in range(stride):
                left = cur[i2 - ch] if i2 >= ch else 0
                cur[i2] = (cur[i2] + ((left + prev[i2]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i2 in range(stride):
                a = cur[i2 - ch] if i2 >= ch else 0
                c = prev[i2 - ch] if i2 >= ch else 0
                cur[i2] = (cur[i2] + _paeth(a, prev[i2], c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = np.frombuffer(bytes(cur), dtype=np.uint8)
        prev = cur
    px = out.reshape(h, w, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
    return px


# ----------------------------------------------------------------- BMP


def encode_bmp(arr: np.ndarray, *, top_down: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up by default; ``top_down`` writes the negative-height
    variant)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("encode_bmp takes RGB")
    pad = (-(w * 3)) % 4
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        rows.append(arr[y, :, ::-1].tobytes() + bytes(pad))  # RGB->BGR
    pix = b"".join(rows)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 14 + 40)
    return head + dib + pix


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed BI_RGB BMP (8-bit palette / 24 / 32 bpp,
    bottom-up or top-down) into (h, w, 3|4) uint8 RGB(A)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    dib_size, w, h_signed, planes, bpp = struct.unpack("<IiiHH", data[14:30])
    if dib_size < 40:
        raise ValueError("unsupported BMP header (BITMAPCOREHEADER)")
    (compression,) = struct.unpack("<I", data[30:34])
    if compression == 3 and bpp == 32 and dib_size >= 56:
        # BI_BITFIELDS with the STANDARD BGRA masks is byte-identical
        # to plain 32bpp (the layout BITMAPV4/V5 writers emit)
        masks = struct.unpack("<III", data[54:66])
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise ValueError(f"unsupported BMP channel masks {[hex(m) for m in masks]}")
    elif compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    top_down = h_signed < 0
    h = abs(h_signed)
    if bpp == 8:
        (clr_used,) = struct.unpack("<I", data[46:50])
        n_pal = clr_used or 256
        pal_off = 14 + dib_size
        pal = np.frombuffer(data[pal_off : pal_off + 4 * n_pal], dtype=np.uint8).reshape(-1, 4)
        pal_rgb = pal[:, [2, 1, 0]]  # BGRA -> RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(data[offset : offset + stride * h], dtype=np.uint8).reshape(h, stride)[:, :w]
        px = pal_rgb[rows]
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = np.frombuffer(data[offset : offset + stride * h], dtype=np.uint8).reshape(h, stride)[
            :, : w * nb
        ].reshape(h, w, nb)
        px = rows[:, :, [2, 1, 0]] if nb == 3 else rows[:, :, [2, 1, 0, 3]]
    else:
        raise ValueError(f"unsupported BMP bpp {bpp}")
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


# ----------------------------------------------------------------- GIF

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable code width, CLEAR emitted first and on
    dictionary overflow at 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _sub_blocks(data: bytes, i: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        ln = data[i]
        i += 1
        if ln == 0:
            return b"".join(chunks), i
        chunks.append(data[i : i + ln])
        i += ln


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    *,
    delays_cs: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode (h, w) uint8 palette-index frames + an (n<=256, 3) RGB
    palette as a multi-frame GIF89a (all frames full-canvas here;
    decode supports arbitrary rects)."""
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    n_pal = len(palette)
    pal_bits = max(1, (n_pal - 1).bit_length())
    pal_full = np.zeros((1 << pal_bits, 3), dtype=np.uint8)
    pal_full[:n_pal] = palette
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1), 0, 0])
    out += pal_full.tobytes()
    delays = delays_cs or [10] * len(frames)
    min_code = max(2, pal_bits)
    for fi, fr in enumerate(frames):
        fr = np.ascontiguousarray(fr, dtype=np.uint8)
        out += b"\x21\xf9\x04" + bytes([0]) + struct.pack("<H", delays[fi]) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, fr.shape[1], fr.shape[0])
        out += bytes([0x40 if interlace else 0x00])
        rows = fr
        if interlace:
            order = []
            for start, step in _GIF_INTERLACE_PASSES:
                order.extend(range(start, fr.shape[0], step))
            rows = fr[order]
        lzw = _lzw_encode(rows.tobytes(), min_code)
        out.append(min_code)
        for off in range(0, len(lzw), 255):
            blk = lzw[off : off + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(data: bytes) -> list[dict]:
    """Decode every frame of a GIF into
    ``{"index", "delay_cs", "top", "left", "pixels": (h, w, 3) uint8}``
    (palette applied; frames stay their own rects — no disposal
    compositing)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    W, H = struct.unpack("<HH", data[6:10])
    packed, _bg, _aspect = data[10], data[11], data[12]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
        i += 3 * n
    frames: list[dict] = []
    delay = 0
    while i < len(data):
        b = data[i]
        i += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[i]
            i += 1
            body, i = _sub_blocks(data, i)
            if label == 0xF9 and len(body) >= 3:
                (delay,) = struct.unpack("<H", body[1:3])
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h = struct.unpack("<HHHH", data[i : i + 8])
        fpacked = data[i + 8]
        i += 9
        pal = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(data[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
            i += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any palette")
        min_code = data[i]
        i += 1
        lzw, i = _sub_blocks(data, i)
        idx = np.frombuffer(_lzw_decode(lzw, min_code)[: w * h], dtype=np.uint8).reshape(h, w)
        if fpacked & 0x40:  # interlaced: invert the pass ordering
            order = []
            for start, step in _GIF_INTERLACE_PASSES:
                order.extend(range(start, h, step))
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        frames.append(
            {
                "index": len(frames),
                "delay_cs": int(delay),
                "top": int(top),
                "left": int(left),
                "pixels": pal[idx],
            }
        )
        delay = 0
    return frames


# ------------------------------------------------- deterministic fixtures


def formula_pixels(seed: int, w: int, h: int, ch: int = 3) -> np.ndarray:
    """The closed-form fixture pixels ``(seed + 3x + 7y + 11c) mod 256``
    — an oracle can integrate any statistic of these algebraically
    without decoding bytes."""
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(ch)[None, None, :]
    return ((seed + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)


# ----------------------------------------------------------------- WAV
# (lives here with the other pure-stdlib media codecs; audio is the
# third opaque-binary modality the multimodal plumbing declares)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode (n, channels) int16 PCM samples as a canonical RIFF WAV."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV into ((n, channels) int16 array, sample_rate).
    16-bit integer PCM only (format tag 1) — float/ADPCM/extensible
    raise ValueError; chunk walk skips unknown chunks (LIST, fact...)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(data)
    fmt = None
    pcm = None
    while i + 8 <= n:
        tag = data[i : i + 4]
        (ln,) = struct.unpack("<I", data[i + 4 : i + 8])
        body = data[i + 8 : i + 8 + ln]
        i += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
            if fmt is not None:
                break
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _bps, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding (fmt={audio_fmt}, bits={bits})")
    arr = np.frombuffer(pcm[: len(pcm) - len(pcm) % (2 * ch)], dtype="<i2")
    return arr.reshape(-1, ch), rate


def formula_samples(seed: int, n: int, ch: int = 1) -> np.ndarray:
    """Closed-form int16 fixture samples
    ``((seed + 5i + 9c) mod 65536) - 32768`` — same oracle philosophy
    as :func:`formula_pixels`."""
    i = np.arange(n)[:, None]
    c = np.arange(ch)[None, :]
    return (((seed + 5 * i + 9 * c) % 65536) - 32768).astype(np.int16)


# ----------------------------------------------------------------- AVI
# Uncompressed ('DIB ') AVI: the RIFF walk again, with BMP-style raw
# frames — a REAL video container decodable without ffmpeg. Compressed
# fourccs (mjpg, h264...) are the honest ffmpeg boundary.


def encode_avi(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """Encode (h, w, 3) uint8 RGB frames as an uncompressed 24-bit AVI
    ('vids'/'DIB ' stream, bottom-up BGR rows padded to 4 bytes)."""
    h, w, _ = frames[0].shape
    pad = (-(w * 3)) % 4
    frame_size = (w * 3 + pad) * h
    us_per_frame = 1_000_000 // fps

    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, frame_size * fps, 0, 0x10, len(frames), 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"DIB "
        # flags, priority, language, initial_frames, scale, rate, start,
        # length, suggested_buffer, quality, sample_size
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), frame_size, 0xFFFFFFFF, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(body)) + kind + body

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b""
    for fr in frames:
        fr = np.ascontiguousarray(fr, dtype=np.uint8)
        rows = b"".join(
            fr[y, :, ::-1].tobytes() + bytes(pad) for y in range(h - 1, -1, -1)
        )
        movi_body += chunk(b"00db", rows)
    movi = lst(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(data: bytes) -> tuple[list[np.ndarray], int]:
    """Decode an uncompressed 24-bit AVI into ((h, w, 3) RGB frame
    list, microseconds-per-frame). Compressed streams ('00dc' without a
    'DIB ' fourcc, MJPG etc.) raise ValueError — the ffmpeg boundary."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = None
    us_per_frame = 0
    bpp = 24
    frames: list[np.ndarray] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, us_per_frame, bpp
        i = lo
        while i + 8 <= hi:
            tag = data[i : i + 4]
            (ln,) = struct.unpack("<I", data[i + 4 : i + 8])
            body_lo = i + 8
            body_hi = min(body_lo + ln, hi)
            if tag == b"LIST":
                walk(body_lo + 4, body_hi)  # skip the list kind fourcc
            elif tag == b"avih":
                (us_per_frame,) = struct.unpack("<I", data[body_lo : body_lo + 4])
                w, h = struct.unpack("<II", data[body_lo + 32 : body_lo + 40])
            elif tag == b"strh":
                fourcc = data[body_lo + 4 : body_lo + 8]
                if data[body_lo : body_lo + 4] == b"vids" and fourcc not in (
                    b"DIB ", b"\x00\x00\x00\x00",
                ):
                    raise ValueError(f"unsupported AVI codec {fourcc!r} (needs ffmpeg)")
            elif tag == b"strf":
                (bpp,) = struct.unpack("<H", data[body_lo + 14 : body_lo + 16])
                if bpp != 24:
                    raise ValueError(f"unsupported AVI bit depth {bpp}")
            elif tag in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("AVI frame before avih header")
                pad = (-(w * 3)) % 4
                stride = w * 3 + pad
                raw = np.frombuffer(data[body_lo : body_lo + stride * h], dtype=np.uint8)
                fr = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
                frames.append(np.ascontiguousarray(fr[::-1]))
            i = body_lo + ln + (ln & 1)

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI with no decodable frames")
    return frames, int(us_per_frame)


# ---------------------------------------------------------------- JPEG
# Baseline sequential JPEG (SOF0), both directions, pure stdlib+numpy.
# The decoder is TABLE-DRIVEN — Huffman tables come from the file's own
# DHT segments, quantization from DQT — so it decodes real-world
# baseline files, not just our encoder's output. Progressive (SOF2),
# arithmetic coding and 12-bit precision raise ValueError (scope).
# The encoder emits 4:4:4 (or grayscale) with CUSTOM flat-length
# canonical Huffman tables (all DC categories at one code length, all
# 162 AC symbols at another) — valid canonical tables any conformant
# decoder accepts, with zero hardcoded spec tables to mis-remember.

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

_DCT_C = np.array(
    [
        [np.sqrt(1 / 8)] * 8
    ]
    + [
        [np.sqrt(2 / 8) * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
        for u in range(1, 8)
    ]
)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _DCT_C.T @ block @ _DCT_C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _DCT_C @ block @ _DCT_C.T


class _HuffDecoder:
    """Canonical Huffman decoder from a DHT (counts[16], symbols)."""

    def __init__(self, counts, symbols):
        self.lookup = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                k += 1
                code += 1
            code <<= 1

    def read(self, br) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at markers (restart handling is the caller's job)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("unexpected marker inside scan")
            self.buf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Drop partial bits and consume a marker (for restarts)."""
        self.nbits = 0
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        if self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1]
        self.pos += 2
        return m


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG into (h, w, 3) RGB or (h, w, 1)
    grayscale uint8. Handles 4:4:4 / 4:2:2 / 4:2:0 subsampling (nearest
    upsample), restart intervals, multiple DHT/DQT segments."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    while True:
        if data[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = data[i + 1]
        i += 2
        if marker == 0xFF:  # 0xFF fill bytes before a marker (T.81 B.1.1.2)
            i -= 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        if marker == 0xD9:
            raise ValueError("JPEG EOI before scan")
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int32)
                    j += 64
                else:
                    tbl = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int32)
                    j += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                counts = list(seg[j + 1 : j + 17])
                n = sum(counts)
                symbols = list(seg[j + 17 : j + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(counts, symbols)
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline-ish)
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG mode (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c : 3 + 2 * c]
                scan_sel[cid] = (tabs >> 4, tabs & 0xF)
            i += seglen
            return _decode_scan(
                data, i, frame, scan_sel, qt, huff_dc, huff_ac, restart_interval
            )
        i += seglen


def _decode_scan(data, pos, frame, scan_sel, qt, huff_dc, huff_ac, dri):
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                m = br.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("missing JPEG restart marker")
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_sel[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = huff_dc[dc_t].read(br)
                        diff = _extend(br.bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = huff_ac[ac_t].read(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZIGZAG] = zz * q
                        px = _idct2(blk.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution and crop
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        for k in range(width - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.buf <<= 8 - self.nbits
            self.buf |= (1 << (8 - self.nbits)) - 1  # pad with 1s per spec
            self.out.append(self.buf)
            if self.buf == 0xFF:
                self.out.append(0x00)
            self.buf = 0
            self.nbits = 0


# flat canonical tables (see module note): every DC category at code
# length 4, every AC (run,size) symbol at code length 8 — valid DHT any
# conformant decoder accepts, nothing spec-memorized to get wrong.
_JPEG_DC_SYMS = list(range(12))
_JPEG_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_JPEG_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_JPEG_AC_COUNTS = [0] * 7 + [len(_JPEG_AC_SYMS)] + [0] * 8


def _flat_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes

_JPEG_DC_CODES = _flat_codes(_JPEG_DC_COUNTS, _JPEG_DC_SYMS)
_JPEG_AC_CODES = _flat_codes(_JPEG_AC_COUNTS, _JPEG_AC_SYMS)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(arr: np.ndarray, *, quant: int = 1, restart_interval: int = 0) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline 4:4:4 JPEG with uniform quantization ``quant`` (1 =
    highest fidelity; grayscale images whose pixels are constant within
    each aligned 8x8 block round-trip BIT-EXACTLY at quant=1 — only the
    integer DC coefficient survives the DCT, which is what makes the
    decode oracle-able)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        r, g, b = (arr[:, :, k].astype(np.float64) for k in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = []
    for p in planes:
        q = np.empty((ph, pw))
        q[:h, :w] = p
        q[h:, :w] = p[-1:, :]
        q[:, w:] = q[:, w - 1 : w]
        padded.append(q)

    qtab = np.full(64, quant, dtype=np.int32)
    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                pred = [0] * len(planes)
            mcu_count += 1
            for ci, p in enumerate(padded):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = np.round(_fdct2(blk) / qtab.reshape(8, 8)).astype(np.int64)
                zz = coef.reshape(-1)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s = _category(diff)
                code, ln = _JPEG_DC_CODES[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                run = 0
                last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = _JPEG_AC_CODES[0xF0]
                        bw.write(c, ln)
                        run -= 16
                    s = _category(v)
                    c, ln = _JPEG_AC_CODES[(run << 4) | s]
                    bw.write(c, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    c, ln = _JPEG_AC_CODES[0x00]
                    bw.write(c, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(qtab.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + bytes(_JPEG_DC_SYMS)
        + bytes([0x10]) + bytes(_JPEG_AC_COUNTS) + bytes(_JPEG_AC_SYMS),
    )
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])  # component id, 1x1 sampling, qtab 0
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
