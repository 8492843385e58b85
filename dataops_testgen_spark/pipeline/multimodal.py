"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata; decode / feature
extraction run as Arrow-batched ``mapInPandas`` stages (the only place Python
touches the data, and it streams batch-by-batch — bounded memory per task,
shape-preserving partitioning).

Decode is REAL wherever a codec-less container allows: uncompressed
BMP/PPM/PGM rasters, 8-bit gray/RGB non-interlaced PNG (stdlib zlib
inflate + scanline unfilter), single-frame GIF (full in-module LZW
codec), and RIFF/WAVE PCM audio (``decode_audio``). JPEG/MP3-class
formats still need external codecs — ``decode_stub`` stands in for
those behind a deterministic fake, with the Spark-side plumbing
(schema, batch iteration, UDF signature, partition behavior) real and
tested; swap it for a PIL/librosa call in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("content_md5", T.StringType()),
    T.StructField("fake_feature", T.DoubleType()),
])


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake 'decode': real decoders (PIL.Image.open,
    soundfile.read, av.open) are unavailable in this container.

    Returns byte-level features any real decoder would subsume."""
    if payload is None:
        return {"byte_len": None, "first_byte": None, "fake_feature": None}
    return {
        "byte_len": len(payload),
        "first_byte": payload[0] if payload else None,
        # stand-in for e.g. mean pixel luminance
        "fake_feature": (sum(payload[:64]) / min(len(payload), 64)) if payload else 0.0,
    }


def encode_bmp_gray(pixel_bytes: bytes, width: int | None = None) -> bytes:
    """Minimal uncompressed 24-bit BMP (BI_RGB): each input byte becomes
    one gray pixel (B=G=R=byte), ``width`` pixels per row (default: one
    single row). ``len(pixel_bytes)`` must divide evenly into rows. The
    deterministic fixture builder for the REAL decode path below — no
    codec library on either side."""
    n = len(pixel_bytes)
    if n == 0:
        raise ValueError("need at least one pixel byte")
    w = width or n
    if n % w:
        raise ValueError(f"{n} pixels do not fill rows of width {w}")
    h = n // w
    stride_pad = (-(w * 3)) % 4                   # rows pad to 4 bytes
    rows = []
    # BMP stores rows bottom-up; emit them so row 0 is the TOP row
    for r in range(h - 1, -1, -1):
        seg = pixel_bytes[r * w:(r + 1) * w]
        rows.append(b"".join(bytes((v, v, v)) for v in seg)
                    + bytes(stride_pad))
    raster = b"".join(rows)
    data_off = 14 + 40
    hdr = (b"BM" + (data_off + len(raster)).to_bytes(4, "little")
           + b"\x00\x00\x00\x00" + data_off.to_bytes(4, "little"))
    dib = ((40).to_bytes(4, "little")
           + w.to_bytes(4, "little", signed=True)          # width
           + h.to_bytes(4, "little", signed=True)          # height (+: bottom-up)
           + (1).to_bytes(2, "little")                     # planes
           + (24).to_bytes(2, "little")                    # bpp
           + (0).to_bytes(4, "little")                     # BI_RGB
           + len(raster).to_bytes(4, "little")             # image size
           + bytes(16))                                    # ppm/palette
    return hdr + dib + raster


def decode_bmp_gray(payload: bytes):
    """(width, height, top-down gray pixel bytes) from an uncompressed
    24-bit BI_RGB BMP, taking the blue channel as the gray value — the
    raster accessor ``resize_image`` builds on. Stdlib-only."""
    b = bytes(payload)
    if b[:2] != b"BM" or len(b) < 54:
        raise NotImplementedError("not an uncompressed BMP")
    data_off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h_raw = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0 or bpp != 24:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    h = abs(h_raw)
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for r in range(h):
        start = data_off + r * stride
        rows.append(bytes(b[start + 3 * i] for i in range(w)))
    if h_raw > 0:                  # bottom-up storage -> flip to top-down
        rows.reverse()
    return w, h, b"".join(rows)


def resize_image(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbour resize of an uncompressed 24-bit BMP — REAL,
    stdlib-only (decode raster → index-map sample → re-encode). The
    resize stage of an image pipeline; compressed formats raise like
    ``decode_image``."""
    w, h, px = decode_bmp_gray(payload)
    out = bytearray()
    for oy in range(out_h):
        sy = min(h - 1, (oy * h) // out_h)
        base = sy * w
        for ox in range(out_w):
            out.append(px[base + min(w - 1, (ox * w) // out_w)])
    return encode_bmp_gray(bytes(out), width=out_w)


def resize_features(df: DataFrame, out_w: int, out_h: int,
                    binary_col: str = "payload",
                    id_col: str = "doc_id") -> DataFrame:
    """mapInPandas resize stage: (doc_id, resized payload, width, height).
    Undecodable/NULL payloads yield NULL payload (same fallback contract
    as extract_decoded_features)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rz(b):
            if b is None or not len(b):
                return None
            try:
                return resize_image(bytes(b), out_w, out_h)
            except (NotImplementedError, ValueError, IndexError):
                return None

        for pdf in batches:
            res = pdf[binary_col].map(rz)
            yield pd.DataFrame({
                "doc_id": pdf[id_col], "payload": res,
                "width": [None if r is None else out_w for r in res],
                "height": [None if r is None else out_h for r in res]})

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType())])
    return df.select(id_col, binary_col).mapInPandas(run, schema)


def sample_frames(df: DataFrame, frame_bytes: int, every_k: int = 1,
                  binary_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """Frame sampling over an opaque video-like binary column: treat the
    payload as concatenated fixed-size frames and emit every ``k``-th as
    its own row (doc_id, frame_idx, frame). This IS the real Spark-side
    shape of video frame extraction — per-batch Arrow iteration, row
    explosion bounded by payload size, partitioning preserved; only the
    frame boundary rule is the deterministic stand-in (a real container
    demuxer — PyAV et al. — replaces the fixed-size slicing; no video
    codecs in this container)."""
    if frame_bytes < 1 or every_k < 1:
        raise ValueError("frame_bytes and every_k must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc, b in zip(pdf[id_col], pdf[binary_col]):
                if b is None:
                    continue
                raw = bytes(b)
                for i in range(0, len(raw) // frame_bytes, every_k):
                    ids.append(doc)
                    idxs.append(i)
                    frames.append(raw[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame": frames})

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType())])
    return df.select(id_col, binary_col).mapInPandas(run, schema)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (len(body).to_bytes(4, "big") + tag + body
            + zlib.crc32(tag + body).to_bytes(4, "big"))


def encode_png(pixel_bytes: bytes, width: int | None = None,
               channels: int = 1, filter_cycle: bool = False) -> bytes:
    """Minimal PNG encoder (stdlib zlib): 8-bit grayscale (``channels=1``)
    or RGB (``channels=3``), non-interlaced. ``filter_cycle=True`` applies
    scanline filter ``row % 5`` (None/Sub/Up/Average/Paeth) instead of
    filter 0 everywhere, so a round-trip through ``decode_image``
    exercises every PNG filter type. Deterministic fixture builder for
    the real compressed-decode path — no codec library on either side."""
    import zlib

    n = len(pixel_bytes)
    if n == 0 or n % channels:
        raise ValueError("pixel bytes must be a positive multiple of "
                         "channels")
    w = width or (n // channels)
    if (n // channels) % w:
        raise ValueError(f"{n // channels} pixels do not fill rows of "
                         f"width {w}")
    h = n // channels // w
    stride, bpp = w * channels, channels
    raw = bytearray()
    prev = bytes(stride)
    for r in range(h):
        row = pixel_bytes[r * stride:(r + 1) * stride]
        ft = (r % 5) if filter_cycle else 0
        raw.append(ft)
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            bb = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - a
            elif ft == 2:
                v = row[i] - bb
            elif ft == 3:
                v = row[i] - (a + bb) // 2
            else:
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    bb if pb <= pc else c)
                v = row[i] - pred
            raw.append(v & 0xFF)
        prev = row
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 0 if channels == 1 else 2, 0, 0, 0]))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _decode_png(b: bytes) -> dict:
    """8-bit grayscale/RGB non-interlaced PNG decode: chunk walk, zlib
    inflate, per-scanline unfilter (all five filter types), mean over the
    reconstructed raster. Palette/16-bit/interlaced variants raise."""
    import zlib

    i, w = 8, None
    idat = bytearray()
    while i + 8 <= len(b):
        ln = int.from_bytes(b[i:i + 4], "big")
        tag = b[i + 4:i + 8]
        body = b[i + 8:i + 8 + ln]
        if tag == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, color, interlace = body[8], body[9], body[12]
            if depth != 8 or color not in (0, 2) or interlace != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} "
                    f"interlace={interlace}: only 8-bit gray/RGB "
                    "non-interlaced decodes here")
            channels = 1 if color == 0 else 3
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + ln
    if w is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride, bpp = w * channels, channels
    if len(raw) != h * (stride + 1):
        raise NotImplementedError("PNG raster size mismatch")
    prev = bytearray(stride)
    total = 0
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1:(r + 1) * (stride + 1)])
        for i2 in range(stride):
            a = line[i2 - bpp] if i2 >= bpp else 0
            bb = prev[i2]
            c = prev[i2 - bpp] if i2 >= bpp else 0
            if ft == 1:
                line[i2] = (line[i2] + a) & 0xFF
            elif ft == 2:
                line[i2] = (line[i2] + bb) & 0xFF
            elif ft == 3:
                line[i2] = (line[i2] + (a + bb) // 2) & 0xFF
            elif ft == 4:
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    bb if pb <= pc else c)
                line[i2] = (line[i2] + pred) & 0xFF
            elif ft != 0:
                raise NotImplementedError(f"PNG filter {ft}")
        total += sum(line)
        prev = line
    n = h * stride
    return {"format": "png", "width": w, "height": h,
            "mean_luminance": (total / n) if n else None}


def decode_image(payload: bytes) -> dict:
    """REAL stdlib-only image decode for the formats a codec-less
    container can handle: 24-bit/8-bit BI_RGB BMP, binary PPM (P6) /
    PGM (P5), and — via stdlib zlib — 8-bit gray/RGB non-interlaced PNG
    (full scanline unfilter, all five filter types). Walks the actual
    raster — returns format, width, height and mean_luminance = mean
    over the raster's channel bytes, excluding row padding — and
    single-frame non-interlaced GIF via a full in-module LZW codec
    (giflib code-width convention; round-trip stress-tested through the
    dictionary-growth and 12-bit table-reset paths), and — r7 — REAL
    baseline JPEG (SOF0, 8-bit gray / 4:4:4: marker walk, stream-driven
    Huffman decode, dequantize, numpy IDCT; see ``_decode_jpeg``).
    Progressive/arithmetic/subsampled JPEG and exotic PNG/GIF variants
    still raise NotImplementedError; use parse_media_header for
    dimensions."""
    if not payload:
        raise ValueError("empty payload")
    b = bytes(payload)
    if b[:2] == b"\xff\xd8":
        return _decode_jpeg(b)
    if b[:8] == _PNG_SIG:
        return _decode_png(b)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 13:
        return _decode_gif(b)
    if b[:2] == b"BM" and len(b) >= 54:
        data_off = int.from_bytes(b[10:14], "little")
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = abs(int.from_bytes(b[22:26], "little", signed=True))
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        if comp != 0 or bpp not in (8, 24):
            raise NotImplementedError(f"BMP bpp={bpp} compression={comp} "
                                      "needs a codec")
        bytes_pp = bpp // 8
        row_stride = (w * bytes_pp + 3) // 4 * 4
        total = n = 0
        for r in range(h):
            start = data_off + r * row_stride
            row = b[start:start + w * bytes_pp]     # padding excluded
            total += sum(row)
            n += len(row)
        return {"format": "bmp", "width": w, "height": h,
                "mean_luminance": (total / n) if n else None}
    if b[:2] in (b"P6", b"P5"):
        # header: magic, then whitespace/comment-separated width height
        # maxval, then a single whitespace byte, then the raster
        i, fields = 2, []
        while len(fields) < 3 and i < len(b):
            while i < len(b) and b[i:i + 1].isspace():
                i += 1
            if b[i:i + 1] == b"#":                  # comment to EOL
                while i < len(b) and b[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(b) and not b[j:j + 1].isspace():
                j += 1
            fields.append(int(b[i:j]))
            i = j
        i += 1                                       # the single separator
        w, h, maxval = fields
        if maxval > 255:
            raise NotImplementedError("16-bit PPM/PGM needs byte-pair "
                                      "handling; not embedded by fixtures")
        ch = 3 if b[:2] == b"P6" else 1
        raster = b[i:i + w * h * ch]
        return {"format": "ppm" if ch == 3 else "pgm", "width": w,
                "height": h,
                "mean_luminance": (sum(raster) / len(raster))
                                  if raster else None}
    raise NotImplementedError("compressed/unknown format: codecs not "
                              "available in this container; use "
                              "parse_media_header / decode_stub instead")


def _lzw_compress(indices: bytes, min_code: int) -> bytes:
    """GIF-flavor LZW: emits CLEAR, literal/dictionary codes with growing
    width (max 12 bits, re-CLEAR at dictionary overflow), END; packs
    codes LSB-first into the returned byte string."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out_bits: list[tuple[int, int]] = []          # (code, width)
    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    out_bits.append((clear, width))
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        out_bits.append((table[run], width))
        table[cand] = next_code
        next_code += 1
        # giflib convention: widen as soon as next_code REACHES 2^width,
        # so the first code of value 2^width-? ships at the wider size
        if next_code >= (1 << width):
            if width < 12:
                width += 1
            elif next_code >= (1 << 12):           # table full: reset
                out_bits.append((clear, width))
                table = {bytes([i]): i for i in range(clear)}
                next_code = end + 1
                width = min_code + 1
        run = bytes([byte])
    if run:
        out_bits.append((table[run], width))
    out_bits.append((end, width))
    acc = n = 0
    packed = bytearray()
    for code, w in out_bits:
        acc |= code << n
        n += w
        while n >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        packed.append(acc & 0xFF)
    return bytes(packed)


def _lzw_decompress(data: bytes, min_code: int, n_pixels: int) -> bytes:
    """Inverse of ``_lzw_compress`` (handles the KwKwK case and CLEAR
    resets); stops after ``n_pixels`` outputs or the END code."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    pos = 0                                        # bit cursor

    def read(width: int):
        nonlocal pos
        if pos + width > len(data) * 8:
            return None
        byte_i, bit_i = divmod(pos, 8)
        acc = 0
        for k in range((width + bit_i + 7) // 8):
            if byte_i + k < len(data):
                acc |= data[byte_i + k] << (8 * k)
        pos += width
        return (acc >> bit_i) & ((1 << width) - 1)

    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read(width)
        if code is None or code == end:
            break
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]               # KwKwK
        else:
            raise NotImplementedError("corrupt GIF LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # mirror the encoder's giflib widening: the decoder's table lags
        # the encoder by the one entry it will learn from the NEXT code
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_pixels])


def encode_gif_gray(pixel_bytes: bytes, width: int | None = None) -> bytes:
    """Minimal single-frame GIF89a encoder (stdlib-only, REAL LZW): each
    input byte is one pixel indexing a 256-entry gray palette (i,i,i),
    non-interlaced. Deterministic fixture builder for the compressed
    decode path."""
    n = len(pixel_bytes)
    if n == 0:
        raise ValueError("need at least one pixel byte")
    w = width or n
    if n % w:
        raise ValueError(f"{n} pixels do not fill rows of width {w}")
    h = n // w
    gct = b"".join(bytes((i, i, i)) for i in range(256))
    lsd = (w.to_bytes(2, "little") + h.to_bytes(2, "little")
           + bytes([0xF7, 0, 0]))                 # GCT flag, 256 entries
    img = (b"\x2C" + bytes(4) + w.to_bytes(2, "little")
           + h.to_bytes(2, "little") + b"\x00")   # no LCT, no interlace
    lzw = _lzw_compress(pixel_bytes, 8)
    subs = bytearray([8])                          # LZW min code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        subs += bytes([len(chunk)]) + chunk
    subs += b"\x00"
    return b"GIF89a" + lsd + gct + img + bytes(subs) + b"\x3B"


def _decode_gif(b: bytes) -> dict:
    """Single-frame non-interlaced GIF decode: logical screen + color
    tables, extension skip, REAL LZW decompression, palette mapping;
    mean_luminance = mean over the mapped RGB channel bytes."""
    w = int.from_bytes(b[6:8], "little")
    h = int.from_bytes(b[8:10], "little")
    packed = b[10]
    i = 13
    gct = None
    if packed & 0x80:
        size = 3 * (2 << (packed & 0x07))
        gct = b[i:i + size]
        i += size
    while i < len(b):
        block = b[i]
        if block == 0x21:                          # extension: skip
            i += 2
            while i < len(b) and b[i]:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:
            iw = int.from_bytes(b[i + 5:i + 7], "little")
            ih = int.from_bytes(b[i + 7:i + 9], "little")
            ipacked = b[i + 9]
            i += 10
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF")
            ct = gct
            if ipacked & 0x80:
                size = 3 * (2 << (ipacked & 0x07))
                ct = b[i:i + size]
                i += size
            if ct is None:
                raise NotImplementedError("GIF without a color table")
            min_code = b[i]
            i += 1
            lzw = bytearray()
            while i < len(b) and b[i]:
                ln = b[i]
                lzw += b[i + 1:i + 1 + ln]
                i += 1 + ln
            indices = _lzw_decompress(bytes(lzw), min_code, iw * ih)
            if len(indices) < iw * ih:
                raise NotImplementedError("truncated GIF raster")
            total = sum(ct[3 * px] + ct[3 * px + 1] + ct[3 * px + 2]
                        for px in indices)
            return {"format": "gif", "width": iw, "height": ih,
                    "mean_luminance": total / (3 * iw * ih)}
        elif block == 0x3B:
            break
        else:
            raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
    raise NotImplementedError("GIF missing image descriptor")


def encode_wav_pcm(sample_bytes: bytes, sample_rate: int = 8000,
                   bits: int = 8, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE PCM encoder (stdlib-only): ``sample_bytes`` is
    the raw little-endian PCM payload (u8 for ``bits=8``, s16 for
    ``bits=16``). The deterministic audio-fixture builder for the REAL
    decode path — no codec library on either side."""
    if bits not in (8, 16):
        raise ValueError("only 8/16-bit PCM")
    if not sample_bytes or len(sample_bytes) % (channels * bits // 8):
        raise ValueError("sample bytes must fill whole frames")
    block = channels * bits // 8
    fmt = ((1).to_bytes(2, "little")                      # PCM
           + channels.to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + (sample_rate * block).to_bytes(4, "little")  # byte rate
           + block.to_bytes(2, "little")
           + bits.to_bytes(2, "little"))
    body = (b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(sample_bytes).to_bytes(4, "little")
            + sample_bytes + (b"\x00" if len(sample_bytes) % 2 else b""))
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_audio(payload: bytes) -> dict:
    """REAL stdlib-only audio decode for RIFF/WAVE PCM (8-bit unsigned or
    16-bit signed LE): walks the chunk list to fmt + data, then the
    actual samples. Returns format, channels, sample_rate, n_samples
    (frames), duration_s and mean_amplitude (mean raw sample value —
    byte mean for u8, signed mean for s16). r7: FLAC decodes for REAL
    (``_decode_flac`` — rice-coded fixed-predictor subframes, mono
    8/16-bit, signed mean); MP3/AAC/non-PCM WAV raise
    NotImplementedError: their codecs stay out of scope."""
    if not payload:
        raise ValueError("empty payload")
    b = bytes(payload)
    if b[:4] == b"fLaC":
        return _decode_flac(b)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError("compressed/unknown audio format: "
                                  "codecs not available in this container")
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        tag = b[i:i + 4]
        ln = int.from_bytes(b[i + 4:i + 8], "little")
        if tag == b"fmt ":
            fmt = b[i + 8:i + 8 + ln]
        elif tag == b"data":
            data = b[i + 8:i + 8 + ln]
        i += 8 + ln + (ln % 2)                  # chunks pad to even
    if fmt is None or data is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(f"WAV format={audio_format} bits={bits} "
                                  "needs a codec (only PCM 8/16 here)")
    block = channels * bits // 8
    n_frames = len(data) // block
    usable = data[:n_frames * block]
    if bits == 8:
        total, n = sum(usable), len(usable)
    else:
        vals = [int.from_bytes(usable[j:j + 2], "little", signed=True)
                for j in range(0, len(usable), 2)]
        total, n = sum(vals), len(vals)
    return {"format": "wav", "channels": channels,
            "sample_rate": sample_rate, "n_samples": n_frames,
            "duration_s": (n_frames / sample_rate) if sample_rate else None,
            "mean_amplitude": (total / n) if n else None}


AUDIO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("mean_amplitude", T.DoubleType()),
])


def extract_audio_features(df: DataFrame,
                           binary_col: str = "payload",
                           id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched REAL audio decode stage (``decode_audio`` per row):
    NULL fields for NULL/undecodable payloads, the same error-isolated
    mapInPandas shape as ``extract_decoded_features``."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def dec(p):
            if p is None:
                return {}
            try:
                return decode_audio(bytes(p))
            except (NotImplementedError, ValueError, IndexError):
                return {}

        for pdf in batches:
            decoded = pdf[binary_col].map(dec)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "format": decoded.map(lambda d: d.get("format")),
                "channels": decoded.map(lambda d: d.get("channels")),
                "sample_rate": decoded.map(lambda d: d.get("sample_rate")),
                "n_samples": decoded.map(lambda d: d.get("n_samples")),
                "duration_s": decoded.map(lambda d: d.get("duration_s")),
                "mean_amplitude": decoded.map(
                    lambda d: d.get("mean_amplitude")),
            })

    return (df.select(id_col, binary_col)
            .mapInPandas(run, AUDIO_SCHEMA))


def _encoded_payload(df: DataFrame, enc, out_col: str,
                     text_col: str = "text",
                     max_bytes: int = 64,
                     parallelize: bool = False) -> DataFrame:
    """Shared shape of every ``with_*_payload`` demo builder: take the
    first ``max_bytes`` UTF-8 bytes of text, run ``enc(raw_bytes)``
    through an Arrow-batched ``mapInPandas`` (NULL text / empty bytes →
    NULL payload). ``parallelize=True`` spreads a small-file scan first —
    for the compute-bound codec encoders, a one-file corpus would
    otherwise pin every encode+decode to one task."""
    id_col = "doc_id"
    if parallelize:
        from dataops_testgen_spark.session import ensure_parallelism

        df = ensure_parallelism(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")[:max_bytes]
            return enc(raw) if raw else None

        for pdf in batches:
            yield pd.DataFrame({id_col: pdf[id_col],
                                out_col: pdf[text_col].map(one)})

    schema = T.StructType([T.StructField(id_col, T.LongType()),
                           T.StructField(out_col, T.BinaryType())])
    return df.select(id_col, text_col).mapInPandas(run, schema)


def with_gif_payload(df: DataFrame, text_col: str = "text",
                     out_col: str = "gif_payload",
                     max_bytes: int = 64) -> DataFrame:
    """Demo helper for the LZW decode path: wrap the first ``max_bytes``
    UTF-8 bytes of text as gray-palette pixels in a single-frame GIF
    (``encode_gif_gray``, real LZW compression). The palette maps index
    i to (i,i,i), so the decoded mean equals the byte mean the oracle
    derives from the text."""
    return _encoded_payload(df, encode_gif_gray, out_col, text_col,
                            max_bytes, parallelize=True)



def with_wav_payload(df: DataFrame, text_col: str = "text",
                     out_col: str = "wav_payload",
                     max_bytes: int = 64,
                     sample_rate: int = 8000) -> DataFrame:
    """Demo helper for the REAL audio path: wrap the first ``max_bytes``
    UTF-8 bytes of text as unsigned 8-bit PCM samples in a mono WAV
    (``encode_wav_pcm``). The samples equal the byte values, so decoded
    duration/mean stay oracle-checkable from the text alone."""
    return _encoded_payload(
        df, lambda raw: encode_wav_pcm(raw, sample_rate=sample_rate),
        out_col, text_col, max_bytes)



# --- JPEG baseline (SOF0) codec -------------------------------------------
# A REAL DCT/Huffman codec in stdlib+numpy: baseline sequential JPEG,
# 8-bit, grayscale or 4:4:4 YCbCr, table-driven (DQT/DHT come from the
# stream, so foreign baseline files decode too). Progressive/arithmetic/
# subsampled/12-bit variants raise NotImplementedError.

# zigzag scan order -> natural block index (ISO/IEC 10918-1 Figure 5)
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

# Annex K luminance Huffman specs (BITS per code length 1..16, HUFFVAL);
# the decoder never assumes these — it builds tables from the stream's
# own DHT segments — the encoder just has to write SOME valid pair.
_JPEG_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
_JPEG_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)


def _jpeg_canonical_codes(bits, vals):
    """(symbol -> (code, length)) canonical Huffman assignment per the
    JPEG spec's Generate_size_table/Generate_code_table procedure."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _jpeg_decode_tree(bits, vals):
    """((length, code) -> symbol) lookup for bit-serial decoding — the
    inverse of the ONE canonical-code assignment (no second hand copy of
    the Generate_code_table procedure to keep in lockstep)."""
    return {(length, code): sym
            for sym, (code, length) in
            _jpeg_canonical_codes(bits, vals).items()}


def _dct_basis():
    import numpy as np

    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2
    c[0] /= np.sqrt(2.0)
    return c            # F = C @ b @ C.T ; b = C.T @ F @ C


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        if not length:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:            # byte stuffing
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def finish(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def _jpeg_category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _jpeg_encode_block(bw, blk, pred: int, quant: int,
                       dc_codes, ac_codes, cmat) -> int:
    """Encode one 8×8 sample block (level shift, DCT, quantize, zigzag,
    DC-diff + AC run-length Huffman) against ``pred``; returns the new
    DC predictor. Shared by the gray and 4:2:0 fixture encoders."""
    import numpy as np

    coef = cmat @ (blk - 128.0) @ cmat.T
    q = np.rint(coef / float(quant)).astype(np.int64)
    zz = [int(q.flat[k]) for k in _JPEG_ZIGZAG]
    diff = zz[0] - pred
    s = _jpeg_category(diff)
    code, length = dc_codes[s]
    bw.put(code, length)
    if s:
        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]     # ZRL
            bw.put(code, length)
            run -= 16
        s = _jpeg_category(zz[i])
        code, length = ac_codes[(run << 4) | s]
        bw.put(code, length)
        v = zz[i]
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]         # EOB
        bw.put(code, length)
    return zz[0]


def encode_jpeg_gray(pixel_bytes: bytes, width: int | None = None,
                     quant: int = 1) -> bytes:
    """Minimal baseline JPEG encoder (grayscale, SOF0, Annex-K Huffman
    tables, uniform quantization table of ``quant``): per 8×8 block —
    level shift, float 2D DCT, quantize/round, zigzag, DC-difference +
    AC run-length Huffman coding with byte stuffing. Deterministic
    fixture builder for the real DCT/Huffman decode path. With
    ``quant=1`` an image of CONSTANT 8×8 tiles round-trips exactly (a
    constant block's DC is the integer 8·(v−128), every AC is 0), which
    is what keeps the driver query's decoded means oracle-derivable."""
    import numpy as np

    n = len(pixel_bytes)
    if n == 0:
        raise ValueError("empty pixel bytes")
    w = width or n
    if n % w:
        raise ValueError(f"{n} pixels do not fill rows of width {w}")
    h = n // w
    if quant < 1 or quant > 255:
        raise ValueError("quant must be in 1..255")
    img = np.frombuffer(bytes(pixel_bytes), dtype=np.uint8)         .reshape(h, w).astype(np.float64)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    cmat = _dct_basis()
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    pred = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            pred = _jpeg_encode_block(bw, blk, pred, quant,
                                      dc_codes, ac_codes, cmat)
    body = bw.finish()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big")             + payload

    qz = bytes([quant] * 64)
    dht = (bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
           + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sof = (bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
           + bytes([1, 1, 0x11, 0]))
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (b"\xff\xd8"
            + seg(0xDB, bytes([0x00]) + qz)
            + seg(0xC0, sof)
            + seg(0xC4, dht)
            + seg(0xDA, sos)
            + body + b"\xff\xd9")


def encode_jpeg_subsampled(y_bytes: bytes, width: int,
                           sampling: tuple = (2, 2), quant: int = 1,
                           cb_bytes: bytes | None = None,
                           cr_bytes: bytes | None = None) -> bytes:
    """Baseline color JPEG with arbitrary chroma subsampling — Y sampled
    ``sampling=(hs, vs)``, Cb/Cr 1×1, interleaved single scan: (2,2) is
    4:2:0 (the web-dominant layout), (2,1) 4:2:2, (4,1) 4:1:1, (1,1)
    plain 4:4:4 color. The independent fixture encoder for the decoder's
    general hs×vs MCU walk. ``y_bytes`` is the full-resolution luminance
    plane (row-major, ``width`` columns); ``cb_bytes``/``cr_bytes`` are
    the ALREADY-SUBSAMPLED chroma planes at ceil(w/hs)×ceil(h/vs)
    (default neutral 128 everywhere), so constant-tile fixtures
    round-trip exactly at ``quant=1`` and the decoded luminance mean
    stays oracle-derivable from the bytes. All three components share
    the Annex-K luma Huffman tables and one quant table — legal, simple,
    and decoded from the file's own tables anyway."""
    import numpy as np

    hs, vs = sampling
    if not (1 <= hs <= 4 and 1 <= vs <= 4):
        raise ValueError("sampling factors must be in 1..4")
    n = len(y_bytes)
    if n == 0:
        raise ValueError("empty pixel bytes")
    if n % width:
        raise ValueError(f"{n} pixels do not fill rows of width {width}")
    w, h = width, n // width
    cw, ch = -(-w // hs), -(-h // vs)
    if cb_bytes is None:
        cb_bytes = bytes([128]) * (cw * ch)
    if cr_bytes is None:
        cr_bytes = bytes([128]) * (cw * ch)
    if len(cb_bytes) != cw * ch or len(cr_bytes) != cw * ch:
        raise ValueError(f"chroma planes must be {cw}x{ch} (subsampled)")
    if quant < 1 or quant > 255:
        raise ValueError("quant must be in 1..255")

    def plane(raw, pw, phh, bw_mult, bh_mult):
        img = np.frombuffer(bytes(raw), dtype=np.uint8) \
            .reshape(phh, pw).astype(np.float64)
        tw = -(-pw // (8 * bw_mult)) * 8 * bw_mult
        th = -(-phh // (8 * bh_mult)) * 8 * bh_mult
        return np.pad(img, ((0, th - phh), (0, tw - pw)), mode="edge")

    ypl = plane(y_bytes, w, h, hs, vs)      # pad Y to full MCUs
    cbp = plane(cb_bytes, cw, ch, 1, 1)
    crp = plane(cr_bytes, cw, ch, 1, 1)
    # chroma planes must tile the same MCU grid as Y/(hs,vs)
    mcux, mcuy = ypl.shape[1] // (8 * hs), ypl.shape[0] // (8 * vs)
    for p in (cbp, crp):
        assert p.shape[0] >= mcuy * 8 and p.shape[1] >= mcux * 8

    cmat = _dct_basis()
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for my in range(mcuy):
        for mx in range(mcux):
            for byy in range(vs):           # hs·vs Y blocks, raster order
                for bxx in range(hs):
                    py, px = (my * vs + byy) * 8, (mx * hs + bxx) * 8
                    preds[1] = _jpeg_encode_block(
                        bw, ypl[py:py + 8, px:px + 8], preds[1],
                        quant, dc_codes, ac_codes, cmat)
            for cid, p in ((2, cbp), (3, crp)):
                preds[cid] = _jpeg_encode_block(
                    bw, p[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8],
                    preds[cid], quant, dc_codes, ac_codes, cmat)
    body = bw.finish()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) \
            + (len(payload) + 2).to_bytes(2, "big") + payload

    qz = bytes([quant] * 64)
    dht = (bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
           + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sof = (bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
           + bytes([3,
                    1, (hs << 4) | vs, 0,   # Y: hs×vs sampling
                    2, 0x11, 0,             # Cb: 1×1
                    3, 0x11, 0]))           # Cr: 1×1
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    return (b"\xff\xd8"
            + seg(0xDB, bytes([0x00]) + qz)
            + seg(0xC0, sof)
            + seg(0xC4, dht)
            + seg(0xDA, sos)
            + body + b"\xff\xd9")


def encode_jpeg_420(y_bytes: bytes, width: int, quant: int = 1,
                    cb_bytes: bytes | None = None,
                    cr_bytes: bytes | None = None) -> bytes:
    """4:2:0 color JPEG (Y 2×2, Cb/Cr 1×1) — the layout real-world web
    JPEGs overwhelmingly use; see ``encode_jpeg_subsampled``."""
    return encode_jpeg_subsampled(y_bytes, width, sampling=(2, 2),
                                  quant=quant, cb_bytes=cb_bytes,
                                  cr_bytes=cr_bytes)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise NotImplementedError("truncated JPEG entropy stream")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(br: _BitReader, tree: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG Huffman code")


def _decode_jpeg(b: bytes) -> dict:
    """Baseline sequential JPEG decode (SOF0, 8-bit; grayscale, 4:4:4
    and subsampled layouts incl. the web-dominant 4:2:0): marker walk
    (DQT/DHT/DRI/SOF0/SOS), per-MCU Huffman decode over the hs×vs block
    interleave with restart-marker handling, dequantize, inverse
    zigzag, numpy IDCT, level shift. mean_luminance is the mean of the
    LUMINANCE plane (component 1 — Y IS luminance in JPEG's YCbCr), so
    gray and color files report the photometric mean regardless of how
    the chroma is subsampled. Progressive (SOF2), arithmetic, 12-bit
    and non-interleaved subsampled variants raise."""
    import numpy as np

    qtabs: dict[int, list] = {}
    htabs: dict[tuple, dict] = {}
    w = h = None
    comps: list[tuple] = []          # (comp_id, h_samp, v_samp, tq)
    restart = 0
    i = 2                            # past SOI
    if b[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG stream")
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise NotImplementedError("bad JPEG marker stream")
        while b[i + 1] == 0xFF:          # fill bytes before a marker
            i += 1
        marker = b[i + 1]
        if marker == 0xD9:
            break
        ln = int.from_bytes(b[i + 2:i + 4], "big")
        payload = b[i + 4:i + 2 + ln]
        if marker == 0xDB:
            j = 0
            while j < len(payload):
                pq, tq = payload[j] >> 4, payload[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant table")
                qtabs[tq] = list(payload[j + 1:j + 65])
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(payload):
                tc, th = payload[j] >> 4, payload[j] & 0x0F
                bits = list(payload[j + 1:j + 17])
                nv = sum(bits)
                vals = list(payload[j + 17:j + 17 + nv])
                htabs[(tc, th)] = _jpeg_decode_tree(bits, vals)
                j += 17 + nv
        elif marker == 0xC0:
            if payload[0] != 8:
                raise NotImplementedError("non-8-bit JPEG")
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            nc = payload[5]
            comps = [(payload[6 + 3 * k], payload[7 + 3 * k] >> 4,
                      payload[7 + 3 * k] & 0x0F, payload[8 + 3 * k])
                     for k in range(nc)]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF 0x{marker:02x} (progressive/extended/"
                "arithmetic) not supported")
        elif marker == 0xDD:
            restart = int.from_bytes(payload[:2], "big")
        elif marker == 0xDA:
            if w is None or not qtabs or not htabs:
                raise NotImplementedError("JPEG SOS before SOF/DQT/DHT")
            ns = payload[0]
            sel = [(payload[1 + 2 * k], payload[2 + 2 * k] >> 4,
                    payload[2 + 2 * k] & 0x0F) for k in range(ns)]
            data_start = i + 2 + ln
            return _jpeg_scan(b, data_start, w, h, comps, sel, qtabs,
                              htabs, restart)
        i += 2 + ln
    raise NotImplementedError("JPEG missing SOS scan")


def _jpeg_scan(b, start, w, h, comps, sel, qtabs, htabs, restart):
    import numpy as np

    # split the entropy stream at restart markers, unstuff 0xFF00
    segments, cur = [], bytearray()
    i = start
    while i < len(b):
        byte = b[i]
        if byte == 0xFF:
            nxt = b[i + 1] if i + 1 < len(b) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break                        # EOI or next marker
        cur.append(byte)
        i += 1
    segments.append(bytes(cur))

    cmat = _dct_basis()
    by_id = {cid: tq for cid, _, _, tq in comps}
    samp = {cid: (hs, vs) for cid, hs, vs, _ in comps}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    if any(hmax % hs or vmax % vs for _, hs, vs, _ in comps):
        raise NotImplementedError("non-integer JPEG sampling ratio")
    if len(sel) == 1 and len(comps) > 1 and (hmax, vmax) != (1, 1):
        raise NotImplementedError("non-interleaved subsampled JPEG scan")
    # MCU covers (8·hmax)×(8·vmax) image pixels; each component
    # contributes an hs×vs raster of 8×8 blocks per MCU (ISO 10918-1
    # A.2.3 interleave order)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    planes = {cid: np.zeros((mcuy * vs * 8, mcux * hs * 8))
              for cid, hs, vs, _ in comps}
    preds = {cid: 0 for cid, _, _, _ in comps}
    seg_idx = 0
    br = _BitReader(segments[0])
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise NotImplementedError("missing JPEG restart segment")
            br = _BitReader(segments[seg_idx])
            preds = {cid: 0 for cid in preds}
        my, mx = divmod(m, mcux)
        for cid, td, ta in sel:
            qt = qtabs.get(by_id.get(cid))
            dc_tree = htabs.get((0, td))
            ac_tree = htabs.get((1, ta))
            if qt is None or dc_tree is None or ac_tree is None:
                raise NotImplementedError("JPEG scan references missing "
                                          "tables")
            hs, vs = samp[cid]
            for byy in range(vs):
                for bxx in range(hs):
                    s = _huff_decode(br, dc_tree)
                    diff = _jpeg_extend(br.bits(s), s) if s else 0
                    preds[cid] += diff
                    zz = [0] * 64
                    zz[0] = preds[cid] * qt[0]
                    k = 1
                    while k < 64:
                        sym = _huff_decode(br, ac_tree)
                        if sym == 0x00:
                            break
                        run, size = sym >> 4, sym & 0x0F
                        if size == 0:
                            if run != 15:
                                raise NotImplementedError(
                                    "bad JPEG AC symbol")
                            k += 16
                            continue
                        k += run
                        if k > 63:
                            raise NotImplementedError(
                                "JPEG AC index overflow")
                        zz[k] = _jpeg_extend(br.bits(size), size) * qt[k]
                        k += 1
                    coef = np.zeros(64)
                    for pos, nat in enumerate(_JPEG_ZIGZAG):
                        coef[nat] = zz[pos]
                    blk = cmat.T @ coef.reshape(8, 8) @ cmat + 128.0
                    py, px = (my * vs + byy) * 8, (mx * hs + bxx) * 8
                    planes[cid][py:py + 8, px:px + 8] = blk
    lum_id = sel[0][0]
    plane = planes[lum_id]
    hs, vs = samp[lum_id]
    if (hs, vs) != (hmax, vmax):
        # a subsampled luminance plane (rare, but legal) upsamples by
        # pixel replication before the crop — chroma planes never need
        # it because only the luminance mean is reported
        plane = plane.repeat(vmax // vs, axis=0).repeat(hmax // hs, axis=1)
    y = np.clip(np.rint(plane[:h, :w]), 0, 255)
    return {"format": "jpeg", "width": w, "height": h,
            "mean_luminance": float(y.mean())}


def with_jpeg_payload(df: DataFrame, text_col: str = "text",
                      out_col: str = "jpeg_payload",
                      max_bytes: int = 64) -> DataFrame:
    """Demo helper for the REAL DCT/Huffman decode path: wrap the first
    ``max_bytes`` UTF-8 bytes of text as CONSTANT 8×8 tiles (one tile
    per byte, width 8, quant=1) in a baseline JPEG. A constant tile's
    DCT is an integer DC with zero AC, so quant=1 round-trips exactly
    and the decoded mean equals the byte mean the oracle derives from
    the text — the same hash-matching trick as the BMP/PNG/GIF legs,
    but through a real entropy-coded lossy-format pipeline."""
    def enc(raw):
        tiles = bytearray()
        for v in raw:
            tiles.extend(bytes([v]) * 64)
        return encode_jpeg_gray(bytes(tiles), width=8)

    return _encoded_payload(df, enc, out_col, text_col, max_bytes,
                            parallelize=True)


def with_jpeg420_payload(df: DataFrame, text_col: str = "text",
                         out_col: str = "jpeg420_payload",
                         max_bytes: int = 64) -> DataFrame:
    """Demo helper for the SUBSAMPLED decode path (r9): the same
    constant 8×8 tiles as ``with_jpeg_payload``, but wrapped in a 4:2:0
    COLOR JPEG (Y 2×2, neutral chroma) — each 16×16 MCU covers two
    stacked tiles plus the edge-replicated right half, all constant
    blocks, so quant=1 round-trips exactly through the interleaved
    4-Y+Cb+Cr MCU walk and the decoded luminance mean stays equal to
    the byte mean the oracle derives from the text."""
    def enc(raw):
        tiles = bytearray()
        for v in raw:
            tiles.extend(bytes([v]) * 64)
        return encode_jpeg_420(bytes(tiles), width=8)

    return _encoded_payload(df, enc, out_col, text_col, max_bytes,
                            parallelize=True)



# --- FLAC codec (rice + fixed predictors) ----------------------------------
# A REAL compressed-audio codec in pure Python: FLAC mono 8/16-bit with
# CONSTANT / VERBATIM / FIXED-predictor subframes and rice-coded
# residuals (both 4-bit RICE and 5-bit RICE2 methods, multi-partition,
# escape-to-raw partitions) — the audio twin of the JPEG/PNG/GIF image
# codecs. Stereo, LPC subframes and wasted-bits raise
# NotImplementedError (the fixture encoder never emits them; foreign
# files using them fail loudly rather than mis-decoding).

_FLAC_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                    4: [4, -6, 4, -1]}


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16_flac(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _MsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        if not length:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)          # q zeros then a 1

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


def _put_flac_utf8(fw: "_MsbWriter", val: int) -> None:
    """FLAC's UTF-8-style coded number (frame/sample number in the frame
    header): standard UTF-8 byte shapes extended past Unicode's range to
    7 bytes / 36 bits of payload. The previous encoder handled only the
    1- and 2-byte shapes and silently MASKED frame numbers ≥ 2048 to 5
    bits, emitting spec-invalid streams (driver ADVICE r7,
    multimodal.py:1295). For values below 0x110000 the byte sequence is
    bit-identical to Python's own ``chr(val).encode('utf-8')`` —
    test_flac_utf8_frame_numbers pins that parity."""
    if val < 0x80:
        fw.put(val, 8)
        return
    nbytes = 2
    while nbytes < 7 and val >= (1 << (7 - nbytes + 6 * (nbytes - 1))):
        nbytes += 1
    if val >= (1 << 36):
        raise ValueError(f"FLAC coded number {val} exceeds 36 bits")
    fw.put(((1 << nbytes) - 1) << 1, nbytes + 1)   # nbytes ones, then a zero
    fw.put(val >> (6 * (nbytes - 1)), 7 - nbytes)
    for k in range(nbytes - 2, -1, -1):
        fw.put(0b10, 2)
        fw.put((val >> (6 * k)) & 0x3F, 6)


class _MsbReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            byte = self.data[self.bitpos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return v

    def signed(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def byte_pos(self) -> int:
        return self.bitpos >> 3


def _rice_fold(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _rice_unfold(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u >> 1) + 1)


def encode_flac_pcm(sample_bytes: bytes, sample_rate: int = 8000,
                    block_size: int = 4096, fixed_order: int = 2,
                    partition_order: int = 0,
                    method: str = "auto") -> bytes:
    """Minimal FLAC encoder (mono 8-bit; samples = input bytes − 128,
    FLAC stores SIGNED PCM): STREAMINFO + one frame per ``block_size``
    samples. ``method``: "auto" (CONSTANT when a block is flat, else
    FIXED-``fixed_order`` with rice-coded residuals), "verbatim", or
    "fixed". ``partition_order`` splits each block's residual into 2^p
    rice partitions with independently chosen parameters — the
    structure real encoders emit. Losslessness is exact by
    construction; `tests` pin decoded samples == input."""
    n = len(sample_bytes)
    if n == 0:
        raise ValueError("empty sample bytes")
    if fixed_order not in _FLAC_FIXED_COEF:
        raise ValueError("fixed_order must be 0..4")
    samples = [b - 128 for b in sample_bytes]
    bps = 8

    head = _MsbWriter()
    head.put(0x664C6143, 32)                 # fLaC
    head.put(1, 1)                           # last metadata block
    head.put(0, 7)                           # STREAMINFO
    head.put(34, 24)
    head.put(block_size, 16)
    head.put(block_size, 16)
    head.put(0, 24)
    head.put(0, 24)
    head.put(sample_rate, 20)
    head.put(0, 3)                           # channels - 1
    head.put(bps - 1, 5)
    head.put(n, 36)
    for _ in range(16):
        head.put(0, 8)                       # md5 unset (zeros = skip)

    out = bytearray(head.bytes())
    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start:start + block_size]
        bs = len(blk)
        fw = _MsbWriter()
        fw.put(0x3FFE, 14)                   # sync
        fw.put(0, 1)                         # reserved
        fw.put(0, 1)                         # fixed-blocksize strategy
        fw.put(0b0111, 4)                    # blocksize-1 in 16 bits below
        fw.put(0, 4)                         # sample rate: STREAMINFO
        fw.put(0, 4)                         # mono
        fw.put(0b001, 3)                     # 8 bits/sample
        fw.put(0, 1)                         # reserved
        _put_flac_utf8(fw, frame_no)         # UTF-8-coded frame number
        fw.put(bs - 1, 16)
        hdr = fw.out[:]                      # complete so far, byte-aligned
        fw.put(_crc8(bytes(hdr)), 8)

        flat = all(v == blk[0] for v in blk)
        order = min(fixed_order, bs - 1) if method != "verbatim" else 0
        if method == "auto" and flat:
            fw.put(0, 1)
            fw.put(0b000000, 6)              # CONSTANT
            fw.put(0, 1)
            fw.put(blk[0] & 0xFF, bps)
        elif method == "verbatim":
            fw.put(0, 1)
            fw.put(0b000001, 6)
            fw.put(0, 1)
            for v in blk:
                fw.put(v & 0xFF, bps)
        else:
            fw.put(0, 1)
            fw.put(0b001000 | order, 6)      # FIXED
            fw.put(0, 1)
            for v in blk[:order]:
                fw.put(v & 0xFF, bps)        # warmup
            coef = _FLAC_FIXED_COEF[order]
            resid = [blk[i] - sum(c * blk[i - 1 - j]
                                  for j, c in enumerate(coef))
                     for i in range(order, bs)]
            p = partition_order
            while p and (bs % (1 << p) or (bs >> p) <= order):
                p -= 1                       # spec constraints
            fw.put(0, 2)                     # RICE (4-bit params)
            fw.put(p, 4)
            pos = 0
            for part in range(1 << p):
                cnt = (bs >> p) - (order if part == 0 else 0)
                chunk = resid[pos:pos + cnt]
                pos += cnt
                folded = [_rice_fold(r) for r in chunk]
                mean = (sum(folded) // max(1, len(folded))) or 1
                param = min(14, max(0, mean.bit_length() - 1))
                fw.put(param, 4)
                for u in folded:
                    fw.put_unary(u >> param)
                    fw.put(u, param)
        fw.align()
        body = bytes(fw.out)
        out += body + _crc16_flac(body).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)


def _decode_flac_samples(b: bytes):
    """(samples, sample_rate, channels, bps) from a mono FLAC stream —
    CONSTANT/VERBATIM/FIXED subframes, both rice methods, escape
    partitions; LPC/stereo/wasted-bits raise."""
    if b[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC stream")
    i = 4
    sample_rate = channels = bps = total = None
    while True:
        hdr = b[i]
        btype = hdr & 0x7F
        ln = int.from_bytes(b[i + 1:i + 4], "big")
        if btype == 0:
            r = _MsbReader(b, i + 4)
            r.bits(16), r.bits(16), r.bits(24), r.bits(24)
            sample_rate = r.bits(20)
            channels = r.bits(3) + 1
            bps = r.bits(5) + 1
            total = r.bits(36)
        i += 4 + ln
        if hdr & 0x80:
            break
    if total is None:
        raise NotImplementedError("FLAC missing STREAMINFO")
    if channels != 1:
        raise NotImplementedError("stereo FLAC needs channel decorrelation")
    if bps not in (8, 16):
        raise NotImplementedError(f"FLAC bps={bps} unsupported")

    samples: list[int] = []
    while len(samples) < total and i < len(b):
        r = _MsbReader(b, i)
        if r.bits(14) != 0x3FFE:
            raise NotImplementedError("bad FLAC frame sync")
        r.bits(1)
        r.bits(1)
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        chan = r.bits(4)
        size_code = r.bits(3)
        r.bits(1)
        if chan != 0:
            raise NotImplementedError("FLAC channel assignment != mono")
        lead = r.bits(8)                     # UTF-8-coded frame number
        extra = 0
        if lead >= 0xC0:
            m = lead
            while m & 0x40:
                extra += 1
                m <<= 1
            for _ in range(extra):
                r.bits(8)
        if bs_code == 0b0110:
            bs = r.bits(8) + 1
        elif bs_code == 0b0111:
            bs = r.bits(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise NotImplementedError(f"FLAC blocksize code {bs_code}")
        if sr_code not in (0,):              # 0 = from STREAMINFO
            raise NotImplementedError("in-frame FLAC sample-rate codes")
        sbps = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(size_code)
        if sbps is None:
            raise NotImplementedError("reserved FLAC sample-size code")
        r.bits(8)                            # header CRC-8 (not verified)

        if r.bits(1):
            raise NotImplementedError("bad FLAC subframe pad bit")
        st = r.bits(6)
        if r.bits(1):
            raise NotImplementedError("FLAC wasted-bits not supported")
        if st == 0:
            v = r.signed(sbps)
            blk = [v] * bs
        elif st == 1:
            blk = [r.signed(sbps) for _ in range(bs)]
        elif 8 <= st <= 12:
            order = st - 8
            blk = [r.signed(sbps) for _ in range(order)]
            method = r.bits(2)
            if method not in (0, 1):
                raise NotImplementedError("reserved FLAC residual method")
            pbits = 4 if method == 0 else 5
            escape = (1 << pbits) - 1
            p = r.bits(4)
            resid = []
            for part in range(1 << p):
                cnt = (bs >> p) - (order if part == 0 else 0)
                param = r.bits(pbits)
                if param == escape:
                    raw = r.bits(5)
                    resid.extend(r.signed(raw) if raw else 0
                                 for _ in range(cnt))
                else:
                    for _ in range(cnt):
                        u = (r.unary() << param) | r.bits(param)
                        resid.append(_rice_unfold(u))
            coef = _FLAC_FIXED_COEF[order]
            for k, rv in enumerate(resid):
                idx = order + k
                blk.append(rv + sum(c * blk[idx - 1 - j]
                                    for j, c in enumerate(coef)))
        elif st >= 32:
            raise NotImplementedError("FLAC LPC subframes not supported")
        else:
            raise NotImplementedError(f"reserved FLAC subframe type {st}")
        r.align()
        i = r.byte_pos() + 2                 # frame CRC-16 skipped
        samples.extend(blk)
    return samples[:total], sample_rate, channels, bps


def _decode_flac(b: bytes) -> dict:
    samples, rate, channels, _bps = _decode_flac_samples(b)
    n = len(samples)
    return {"format": "flac", "channels": channels, "sample_rate": rate,
            "n_samples": n,
            "duration_s": (n / rate) if rate else None,
            "mean_amplitude": (sum(samples) / n) if n else None}


def with_flac_payload(df: DataFrame, text_col: str = "text",
                      out_col: str = "flac_payload",
                      max_bytes: int = 64,
                      sample_rate: int = 8000) -> DataFrame:
    """Demo helper for the REAL compressed-audio path: the first
    ``max_bytes`` UTF-8 bytes of text become signed samples
    (byte − 128) rice-compressed into a FLAC (fixed-order-2
    predictor). FLAC is lossless, so the decoded mean_amplitude equals
    the text's byte mean − 128 — oracle-derivable like every other leg,
    but through an entropy-coded audio format."""
    return _encoded_payload(
        df, lambda raw: encode_flac_pcm(raw, sample_rate=sample_rate),
        out_col, text_col, max_bytes, parallelize=True)



_TEXT_CODECS = ("gzip", "zlib", "bz2", "lzma")


def _codec_mod(codec: str):
    import bz2
    import gzip
    import lzma
    import zlib

    try:
        return {"gzip": gzip, "zlib": zlib, "bz2": bz2,
                "lzma": lzma}[codec]
    except KeyError:
        raise ValueError(f"codec must be one of {_TEXT_CODECS}") from None


def compress_text(text: str, codec: str = "gzip") -> bytes:
    """Deterministically compress a text to bytes (gzip pins mtime=0 so
    identical inputs yield identical blobs across runs/hosts)."""
    raw = text.encode("utf-8")
    if codec == "gzip":
        import gzip

        return gzip.compress(raw, mtime=0)
    return _codec_mod(codec).compress(raw)


def with_compressed_payload(df: DataFrame, text_col: str = "text",
                            out_col: str = "payload",
                            codec: str = "gzip") -> DataFrame:
    """Arrow-batched text → compressed-blob stage (the write half of
    compressed-corpus handling; fixtures for the read half below)."""
    _codec_mod(codec)                     # validate eagerly
    id_col = "doc_id"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                out_col: pdf[text_col].map(
                    lambda t: None if t is None else compress_text(t,
                                                                   codec)),
            })

    schema = T.StructType([T.StructField(id_col, T.LongType()),
                           T.StructField(out_col, T.BinaryType())])
    return df.select(id_col, text_col).mapInPandas(run, schema)


def decompress_text(df: DataFrame, binary_col: str = "payload",
                    out_col: str = "text", codec: str = "gzip",
                    id_col: str = "doc_id") -> DataFrame:
    """Compressed-corpus ingestion: web-scale text corpora ship as
    gzip/xz blobs (WARC/WET, The Pile's .xz shards); this is the
    Arrow-batched decompress-on-read stage that turns a binary column
    back into text inside the cluster — no driver round-trip, bounded
    memory per batch, NULL rows and undecodable blobs surface as NULL
    text (error-isolated like the decode stages above)."""
    mod = _codec_mod(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def dec(p):
            if p is None:
                return None
            try:
                return mod.decompress(bytes(p)).decode("utf-8")
            except Exception:          # noqa: BLE001 — corrupt blob -> NULL
                return None

        for pdf in batches:
            yield pd.DataFrame({id_col: pdf[id_col],
                                out_col: pdf[binary_col].map(dec)})

    schema = T.StructType([T.StructField(id_col, T.LongType()),
                           T.StructField(out_col, T.StringType())])
    return df.select(id_col, binary_col).mapInPandas(run, schema)


def parse_media_header(payload: bytes) -> dict:
    """Container-format header parse WITHOUT a codec: format detection from
    magic bytes plus the dimensions/sample-rate fields the headers carry.

    Handles PNG (IHDR width/height), JPEG (SOFn frame width/height), GIF
    (logical screen descriptor), BMP (DIB header), and WAV (fmt chunk
    channels/sample-rate). Anything else → format=None. Pure byte reads, no
    image/audio library needed."""
    none = {"format": None, "width": None, "height": None,
            "channels": None, "sample_rate": None}
    if not payload:
        return none
    b = bytes(payload)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            return {"format": "png",
                    "width": int.from_bytes(b[16:20], "big"),
                    "height": int.from_bytes(b[20:24], "big"),
                    "channels": None, "sample_rate": None}
        if b[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOFn marker
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(b[i + 2:i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    return {"format": "jpeg",
                            "height": int.from_bytes(b[i + 5:i + 7], "big"),
                            "width": int.from_bytes(b[i + 7:i + 9], "big"),
                            "channels": b[i + 9], "sample_rate": None}
                i += 2 + seg_len
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            return {"format": "gif",
                    "width": int.from_bytes(b[6:8], "little"),
                    "height": int.from_bytes(b[8:10], "little"),
                    "channels": None, "sample_rate": None}
        if b[:2] == b"BM" and len(b) >= 26:
            return {"format": "bmp",
                    "width": int.from_bytes(b[18:22], "little", signed=True),
                    "height": abs(int.from_bytes(b[22:26], "little", signed=True)),
                    "channels": None, "sample_rate": None}
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 28:
            return {"format": "wav", "width": None, "height": None,
                    "channels": int.from_bytes(b[22:24], "little"),
                    "sample_rate": int.from_bytes(b[24:28], "little")}
        if b[:4] == b"fLaC" and len(b) >= 21:
            # STREAMINFO is the mandatory first block: sample rate is
            # the 20 bits at byte offset 18 (4 magic + 4 block header
            # + 10 sizes), channels-1 the next 3
            sr = (int.from_bytes(b[18:21], "big") >> 4) & 0xFFFFF
            ch = ((b[20] >> 1) & 0x07) + 1
            return {"format": "flac", "width": None, "height": None,
                    "channels": ch, "sample_rate": sr}
    except (IndexError, ValueError):
        pass
    return none


HEADER_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
])


def extract_media_headers(df: DataFrame, binary_col: str = "payload",
                          id_col: str = "doc_id") -> DataFrame:
    """mapInPandas header extraction: same Arrow-batched shape as
    extract_features, but the parse is REAL (magic bytes + header fields),
    not a stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            heads = [parse_media_header(bytes(b) if b is not None else b"")
                     for b in pdf[binary_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "format": [h["format"] for h in heads],
                "width": [h["width"] for h in heads],
                "height": [h["height"] for h in heads],
                "channels": [h["channels"] for h in heads],
                "sample_rate": [h["sample_rate"] for h in heads],
            })

    return df.select(id_col, binary_col).mapInPandas(run, HEADER_SCHEMA)


def extract_features(df: DataFrame, binary_col: str = "payload",
                     id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over a binary column. One Arrow batch
    in → one pandas frame out; no pivot to the driver; partitioning preserved."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[binary_col].map(lambda b: decode_stub(bytes(b) if b is not None else None))
            out = pd.DataFrame({
                "doc_id": pdf[id_col],
                "byte_len": [f["byte_len"] for f in feats],
                "first_byte": [f["first_byte"] for f in feats],
                "content_md5": pdf[binary_col].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None),
                "fake_feature": [f["fake_feature"] for f in feats],
            })
            yield out

    return df.select(id_col, binary_col).mapInPandas(run, FEATURE_SCHEMA)


DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luminance", T.DoubleType()),
])


def extract_decoded_features(df: DataFrame, binary_col: str = "payload",
                             id_col: str = "doc_id") -> DataFrame:
    """mapInPandas over a binary column through the REAL ``decode_image``
    raster walk (BMP/PPM/PGM). Unsupported or NULL payloads yield NULL
    fields instead of failing the batch — compressed formats stay the
    documented codec gap."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        none = {"format": None, "width": None, "height": None,
                "mean_luminance": None}

        def dec(b):
            if b is None or not len(b):
                return none
            try:
                return decode_image(bytes(b))
            except (NotImplementedError, ValueError, IndexError):
                return none

        for pdf in batches:
            feats = [dec(b) for b in pdf[binary_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "format": [f["format"] for f in feats],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "mean_luminance": [f["mean_luminance"] for f in feats],
            })

    return df.select(id_col, binary_col).mapInPandas(run, DECODED_SCHEMA)


REPORT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("content_md5", T.StringType()),
    T.StructField("fake_feature", T.DoubleType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luminance", T.DoubleType()),
    T.StructField("png_format", T.StringType()),
    T.StructField("png_mean", T.DoubleType()),
    T.StructField("gif_format", T.StringType()),
    T.StructField("gif_mean", T.DoubleType()),
    T.StructField("jpeg_format", T.StringType()),
    T.StructField("jpeg_h", T.IntegerType()),
    T.StructField("jpeg_mean", T.DoubleType()),
    T.StructField("jpeg420_format", T.StringType()),
    T.StructField("jpeg420_w", T.IntegerType()),
    T.StructField("jpeg420_mean", T.DoubleType()),
    T.StructField("wav_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("wav_duration", T.DoubleType()),
    T.StructField("wav_mean", T.DoubleType()),
    T.StructField("flac_format", T.StringType()),
    T.StructField("flac_n", T.LongType()),
    T.StructField("flac_mean", T.DoubleType()),
])


def multimodal_feature_report(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              max_bytes: int = 64,
                              sample_rate: int = 8000) -> DataFrame:
    """All seven codec legs (BMP, PNG, GIF, JPEG, JPEG 4:2:0, WAV, FLAC)
    plus the byte-feature leg in ONE ``mapInPandas`` pass — the fused
    production composition of the same ``encode_*``/``decode_image``/
    ``decode_audio`` codecs the per-leg helpers wrap.

    Why fused (guide §4/§8 discipline): the per-leg composition
    (``with_X_payload`` → ``extract_*``, joined on ``id_col``) reads the
    corpus once PER LEG, crosses the JVM↔Python boundary twice per leg
    (16 crossings), and re-attaches the legs with 7 shuffling joins —
    at 100 TB that is 8 redundant scans and 7 exchanges whose only
    purpose is to zip columns computed from the same row. One pass
    computes every leg's columns per document: one scan, one boundary,
    zero joins. Per-leg NULL semantics are preserved exactly (NULL text
    → NULL everywhere; empty byte prefix → NULL payload → NULL decode
    fields; undecodable payloads → NULL fields, same error isolation).
    Raw doubles are emitted un-rounded — display rounding stays in the
    caller's JVM select so fused == per-leg composition bit-for-bit
    (pinned by tests/test_multimodal.py parity test)."""
    import hashlib

    from dataops_testgen_spark.session import ensure_parallelism

    # one python stage carries every codec: spreading it is worth one
    # small shuffle on a one-file corpus (no-op at real scale)
    src = ensure_parallelism(df.select(id_col, text_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        none_img = {"format": None, "width": None, "height": None,
                    "mean_luminance": None}

        def dec_img(payload):
            if payload is None or not len(payload):
                return none_img
            try:
                return decode_image(bytes(payload))
            except (NotImplementedError, ValueError, IndexError):
                return none_img

        def dec_aud(payload):
            if payload is None:
                return {}
            try:
                return decode_audio(bytes(payload))
            except (NotImplementedError, ValueError, IndexError):
                return {}

        def enc_jpeg_tiles(raw, enc):
            tiles = bytearray()
            for v in raw:
                tiles.extend(bytes([v]) * 64)
            return enc(bytes(tiles), width=8)

        def one(t):
            if t is None:
                full = None
                raw = b""
            else:
                full = t.encode("utf-8")
                raw = full[:max_bytes]
            stub = decode_stub(full)
            row = {
                "byte_len": stub["byte_len"],
                "first_byte": stub["first_byte"],
                "content_md5": (hashlib.md5(full).hexdigest()
                                if full is not None else None),
                "fake_feature": stub["fake_feature"],
            }
            img = dec_img(encode_bmp_gray(raw) if raw else None)
            row.update(format=img["format"], width=img["width"],
                       height=img["height"],
                       mean_luminance=img["mean_luminance"])
            png = dec_img(encode_png(raw, filter_cycle=True) if raw
                          else None)
            row.update(png_format=png["format"],
                       png_mean=png["mean_luminance"])
            gif = dec_img(encode_gif_gray(raw) if raw else None)
            row.update(gif_format=gif["format"],
                       gif_mean=gif["mean_luminance"])
            jpg = dec_img(enc_jpeg_tiles(raw, encode_jpeg_gray) if raw
                          else None)
            row.update(jpeg_format=jpg["format"], jpeg_h=jpg["height"],
                       jpeg_mean=jpg["mean_luminance"])
            j420 = dec_img(enc_jpeg_tiles(raw, encode_jpeg_420) if raw
                           else None)
            row.update(jpeg420_format=j420["format"],
                       jpeg420_w=j420["width"],
                       jpeg420_mean=j420["mean_luminance"])
            wav = dec_aud(encode_wav_pcm(raw, sample_rate=sample_rate)
                          if raw else None)
            row.update(wav_rate=wav.get("sample_rate"),
                       n_samples=wav.get("n_samples"),
                       wav_duration=wav.get("duration_s"),
                       wav_mean=wav.get("mean_amplitude"))
            flac = dec_aud(encode_flac_pcm(raw, sample_rate=sample_rate)
                           if raw else None)
            row.update(flac_format=flac.get("format"),
                       flac_n=flac.get("n_samples"),
                       flac_mean=flac.get("mean_amplitude"))
            return row

        cols = [f.name for f in REPORT_SCHEMA.fields[1:]]
        for pdf in batches:
            rows = [one(t) for t in pdf[text_col]]
            out = {id_col: pdf[id_col]}
            for c in cols:
                out[c] = [r[c] for r in rows]
            yield pd.DataFrame(out)

    return src.mapInPandas(run, REPORT_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        out_col: str = "payload") -> DataFrame:
    """Demo helper: materialize a binary column (UTF-8 bytes of text) so the
    multimodal plumbing is exercisable on the synthetic documents table."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def with_bmp_payload(df: DataFrame, text_col: str = "text",
                     out_col: str = "bmp_payload",
                     max_bytes: int = 64) -> DataFrame:
    """Demo helper for the REAL decode path: wrap the first ``max_bytes``
    UTF-8 bytes of text as gray pixels in a single-row 24-bit BMP
    (``encode_bmp_gray``), Arrow-batched. Empty texts get a NULL payload.
    Deterministic by construction, so decoded width/height/mean stay
    oracle-checkable from the text alone."""
    return _encoded_payload(df, encode_bmp_gray, out_col, text_col,
                            max_bytes)



def with_png_payload(df: DataFrame, text_col: str = "text",
                     out_col: str = "png_payload",
                     max_bytes: int = 64,
                     filter_cycle: bool = True) -> DataFrame:
    """Demo helper for the COMPRESSED decode path: wrap the first
    ``max_bytes`` UTF-8 bytes of text as gray pixels in a single-row
    8-bit PNG (``encode_png``; ``filter_cycle`` keeps the scanline
    filters exercised on multi-row shapes), Arrow-batched. Empty texts
    get a NULL payload. The gray raster equals the byte values, so
    decoded width/height/mean stay oracle-checkable from the text."""
    return _encoded_payload(
        df, lambda raw: encode_png(raw, filter_cycle=filter_cycle),
        out_col, text_col, max_bytes)
