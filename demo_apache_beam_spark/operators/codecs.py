"""Pure-stdlib media codecs — real PNG, WAV, and animated-GIF
encode/decode with zero external dependencies (the container ships no
PIL/libsndfile/pyav; all three formats are fully public specifications:
PNG per RFC 2083 / ISO 15948, WAV per the RIFF/PCM layout the stdlib
``wave`` module implements, GIF per the CompuServe GIF89a spec).

This closes the ``decode_payload`` stub for the formats stdlib can
genuinely carry:

- **PNG**: chunk parsing, zlib inflate of the IDAT stream, and full
  scanline unfiltering (all five filter types — None/Sub/Up/Average/
  Paeth) into a numpy raster. Supported: bit depth 8, color types 0
  (gray), 2 (RGB), 6 (RGBA), interlace 0 — the overwhelming majority of
  real-world PNGs; anything else raises ``ValueError`` (the decoder-seam
  wrappers translate that into the documented ``None`` rejection).
  The encoder writes filter-0 scanlines (with a per-row filter override
  used by tests to pin the decoder's Sub/Up/Average/Paeth paths against
  the spec).
- **WAV**: PCM16 via the stdlib ``wave`` reader/writer over BytesIO.
- **GIF**: LZW decompression (variable-width codes, 12-bit table with
  deferred clear), local/global palettes, sub-rectangle frames,
  four-pass interlacing, transparency, and disposal methods 0-3
  composited onto the logical screen — animated GIFs decode to a real
  (n_frames, H, W, 3) stack, closing the video branch of the decoder
  seam. The encoder fabricates spec-valid animations (used by tests and
  the registry round-trip query).

Decode cost model on executors: one ``zlib.decompress`` (C speed) + an
unfilter pass — vectorized per row (Sub is a per-lane cumulative sum
mod 256; Up is one vector add; Average/Paeth walk pixels within the row
but vectorize across channels). Rasters flow straight into the existing
Arrow-batched operators (``resize_images``/``sample_frames``) through
the same decoder seam the stand-in codecs exercise; GIF adds one LZW
pass (pure-Python but table-bounded) + vectorized palette gather and
rectangle composition per frame.

MP4/JPEG remain out of scope: no stdlib container/DCT support — the
``decode_payload`` contract still documents that boundary.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

class UnsupportedContainerError(ValueError):
    """Raised when a payload's container format has no codec here (MP4
    etc. — no stdlib container/DCT support). A ``ValueError`` subclass
    so the fail-closed decoder contract is unchanged for callers that
    treat any decode failure as a rejected record, while callers that
    route 'codec absent' differently from 'corrupt record' (the old
    ``NotImplementedError`` stub's distinction) can catch this type."""


_PNG_SIG = b"\x89PNG\r\n\x1a\x0a"

#: PNG color type → samples per pixel (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(kind: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + kind
        + data
        + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, row_filters: list[int] | None = None) -> bytes:
    """Encode a uint8 raster — (H, W) gray, (H, W, 3) RGB, or (H, W, 4)
    RGBA — as a valid PNG. ``row_filters`` (tests only) forces a filter
    type per row so every unfilter path is exercisable; production use
    leaves it None (filter 0 rows — simplest valid stream)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    filters = row_filters if row_filters is not None else [0] * h
    if len(filters) != h:
        raise ValueError("row_filters must have one entry per row")

    flat = a.reshape(h, w * ch).astype(np.int64)
    raw = bytearray()
    for y in range(h):
        ft = filters[y]
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros_like(cur)
        left = np.zeros_like(cur)
        left[ch:] = cur[:-ch]
        upleft = np.zeros_like(cur)
        upleft[ch:] = prev[:-ch]
        if ft == 0:
            line = cur
        elif ft == 1:
            line = cur - left
        elif ft == 2:
            line = cur - prev
        elif ft == 3:
            line = cur - (left + prev) // 2
        elif ft == 4:
            line = cur - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"unknown filter {ft}")
        raw.append(ft)
        raw.extend((line & 0xFF).astype(np.uint8).tobytes())

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/upleft to
    a + b - c, ties resolved left, then up."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG to a uint8 array — (H, W) for grayscale, (H, W, C)
    for RGB/RGBA. Raises ``ValueError`` for non-PNG bytes, truncated
    streams, or unsupported variants (bit depth ≠ 8, palette,
    interlaced)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # length + type + data + crc
        if kind == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"bad IHDR length {len(body)}")
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise ValueError("non-standard compression/filter method")
        elif kind == b"IDAT":
            idat.extend(body)
        elif kind == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # corrupt bytes must surface as the documented ValueError — the
        # media pipeline classifies those as bad records; a raw
        # zlib.error would instead kill the whole job (fuzz-pinned)
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size does not match dimensions")

    out = np.empty((height, stride), dtype=np.int64)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if ft == 0:
            cur = line
        elif ft == 1:
            # Sub: recon[x] = line[x] + recon[x-ch] ⇒ per-lane prefix sum
            cur = np.cumsum(line.reshape(width, ch), axis=0).reshape(stride) & 0xFF
        elif ft == 2:
            cur = (line + prev) & 0xFF
        elif ft == 3:
            cur = np.empty(stride, dtype=np.int64)
            for x in range(width):  # left-dependency walks pixels; channels vector
                s = slice(x * ch, (x + 1) * ch)
                left = cur[slice((x - 1) * ch, x * ch)] if x else np.zeros(ch, np.int64)
                cur[s] = (line[s] + (left + prev[s]) // 2) & 0xFF
        elif ft == 4:
            cur = np.empty(stride, dtype=np.int64)
            for x in range(width):
                s = slice(x * ch, (x + 1) * ch)
                if x:
                    left = cur[slice((x - 1) * ch, x * ch)]
                    upleft = prev[slice((x - 1) * ch, x * ch)]
                else:
                    left = upleft = np.zeros(ch, np.int64)
                cur[s] = (line[s] + _paeth(left, prev[s], upleft)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[y] = cur
    arr = out.astype(np.uint8).reshape(height, width, ch)
    return arr[:, :, 0] if ch == 1 else arr


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode int16 PCM — (n,) mono or (n, channels) — as a WAV file."""
    s = np.asarray(samples, dtype=np.int16)
    n_ch = 1 if s.ndim == 1 else s.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(s.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV to ((n,) or (n, channels) int16, sample_rate).
    Raises ``ValueError`` for non-WAV bytes or non-16-bit sample widths."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(f"unsupported sample width {w.getsampwidth()}")
            n_ch = w.getnchannels()
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError, RuntimeError, struct.error) as e:
        # the stdlib wave module leaks EOFError (truncated chunk) and a
        # bare RuntimeError (malformed chunk size -> unseekable skip,
        # wave.py:155) on corrupt bytes — normalize to the documented
        # ValueError so bad records classify instead of killing the job
        raise ValueError(f"not a WAV file: {e!r}") from e
    s = np.frombuffer(frames, dtype=np.int16)
    return (s if n_ch == 1 else s.reshape(-1, n_ch)), rate


def wav_pcm_decoder(kind: str, payload: bytes, meta: dict):
    """Decoder-seam adapter (the audio mirror of
    :func:`png_raster_decoder`): real PCM16 WAV decode → 1-D float64
    mono signal (multi-channel files average their channels — the
    downmix every fingerprint pipeline applies first). Returns ``None``
    for undecodable payloads — the documented rejection path."""
    try:
        samples, _rate = wav_decode(bytes(payload))
    except ValueError:
        return None
    s = samples.astype(np.float64)
    return s if s.ndim == 1 else s.mean(axis=1)


def png_raster_decoder(kind: str, payload: bytes, meta: dict):
    """Decoder-seam adapter (``resize_images`` contract): real PNG decode
    → 2-D float64 grayscale raster (multi-channel rasters average their
    channels — the luminance stand-in that keeps the pooled output one
    number per cell). Returns ``None`` for undecodable payloads — the
    documented rejection path."""
    try:
        img = png_decode(bytes(payload))
    except (ValueError, zlib.error):
        return None
    img = img.astype(np.float64)
    return img if img.ndim == 2 else img.mean(axis=2)


# ---------------------------------------------------------------------------
# GIF (87a/89a) — the multi-frame format stdlib can genuinely carry: LZW
# is implementable from the public specification (CompuServe GIF89a,
# 1990; also W3C note "GIF89a specification"), unlike MP4's container +
# DCT stack. This closes the video branch of the decoder seam with a
# REAL codec: animated GIFs decode to composited RGB frame stacks with
# local/global palettes, sub-rectangle frames, interlacing, disposal
# methods 0-3, and transparency. The encoder exists so tests (and the
# registry round-trip query) can fabricate spec-valid animations from
# deterministic data without any media library.
# ---------------------------------------------------------------------------

_GIF_SIGS = (b"GIF87a", b"GIF89a")

#: interlace passes: (first row, row step) per the spec's four passes
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(fh: int) -> list[int]:
    """Row order of the spec's four interlace passes — the ONE
    permutation both the encoder (applies it) and the decoder (inverts
    it) must agree on for round trips to hold."""
    return [r for start, step in _GIF_INTERLACE for r in range(start, fh, step)]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable-width codes (LSB-first bit packing),
    clear/end codes, widths grow 1 past each table-size power of two up
    to 12 bits; at 4096 entries the table freezes (deferred clear — the
    decoder mirrors this)."""
    cs = max(2, int(min_code_size))
    clear, end = 1 << cs, (1 << cs) + 1
    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    width = cs + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    seq = indices.ravel().tolist()
    if seq:
        cur = int(seq[0])
        for k in seq[1:]:
            k = int(k)
            nxt = table.get((cur, k))
            if nxt is not None:
                cur = nxt
                continue
            emit(cur)
            if next_code < 4096:
                table[(cur, k)] = next_code
                next_code += 1
                # the decoder's table runs ONE entry behind the
                # encoder's (it derives each entry only after reading
                # the next code), so its width bump lands one code
                # later than the encoder's table-size crossing — hence
                # 2^w + 1, not 2^w (the classic LZW sync off-by-one)
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            cur = k
        emit(cur)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    # length-prefixed sub-blocks, zero-terminated
    blocks = bytearray()
    for i in range(0, len(out), 255):
        piece = out[i : i + 255]
        blocks.append(len(piece))
        blocks += piece
    blocks.append(0)
    return bytes(blocks)


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode`; raises ``ValueError`` on codes
    outside the live table or streams shorter than ``expected`` pixels."""
    cs = max(2, int(min_code_size))
    clear, end = 1 << cs, (1 << cs) + 1
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0

    table: list[bytes] = []
    width = prev = 0

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = cs + 1
        prev = -1

    reset()
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev < 0:
            if code >= len(table) or code >= clear:
                # first code after (re)set must be a root
                raise ValueError(f"bad initial LZW code {code}")
            entry = table[code]
        elif code < len(table) and (code < clear or code > end):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError(f"LZW code {code} outside table")
        if n_out + len(entry) > expected:
            raise ValueError("LZW stream overruns raster")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        if prev >= 0 and len(table) < 4096:
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out != expected:
        raise ValueError(f"LZW stream short: {n_out}/{expected} pixels")
    return out


def _gif_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks starting at ``pos``; returns
    (payload, position after the zero terminator)."""
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(data):
            raise ValueError("truncated GIF sub-block")
        parts.append(data[pos : pos + n])
        pos += n


def gif_encode(
    frames,
    palette: np.ndarray | None = None,
    size: tuple[int, int] | None = None,
    offsets: list[tuple[int, int]] | None = None,
    disposals: list[int] | None = None,
    transparent_index: int | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode palette-index frames as an animated GIF89a.

    ``frames``: list of 2-D uint8 index arrays (or one 3-D stack) —
    values index ``palette`` (default: 256-entry grayscale i→(i,i,i)).
    ``size``: (H, W) logical screen; defaults to the max frame extent.
    ``offsets``: per-frame (top, left) placement for sub-rectangle
    frames. ``disposals``: per-frame disposal method (0-3; default 1 =
    leave in place). ``transparent_index``: palette slot treated as
    see-through for every frame. ``interlace`` writes frame rasters in
    the spec's four-pass row order.
    """
    frames = [np.asarray(f, dtype=np.uint8) for f in np.asarray(frames, dtype=np.uint8)] if isinstance(frames, np.ndarray) else [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("no frames")
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    palette = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    offsets = offsets or [(0, 0)] * len(frames)
    disposals = disposals or [1] * len(frames)

    # GCT size field n encodes 2^(n+1) entries — pad to that. The field
    # is 3 bits, so a GIF color table caps at 256 entries: reject larger
    # palettes here instead of emitting structurally invalid bytes.
    if palette.shape[0] > 256:
        raise ValueError(
            f"GIF palettes cap at 256 entries, got {palette.shape[0]}"
        )
    n_entries = max(2, int(palette.shape[0]))
    gct_n = max(0, (n_entries - 1).bit_length() - 1)
    padded = 1 << (gct_n + 1)
    pal = np.zeros((padded, 3), dtype=np.uint8)
    pal[: palette.shape[0]] = palette

    if size is None:
        size = (
            max(t + f.shape[0] for (t, _), f in zip(offsets, frames)),
            max(left + f.shape[1] for (_, left), f in zip(offsets, frames)),
        )
    h, w = size
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | gct_n)  # GCT present, color resolution 0
    out += b"\x00\x00"  # bg index, aspect
    out += pal.tobytes()

    min_code = max(2, padded.bit_length() - 1)
    for f, (top, left), disp in zip(frames, offsets, disposals):
        if int(f.max(initial=0)) >= padded:
            raise ValueError("frame index outside palette")
        # graphic control extension
        packed = (int(disp) & 0x7) << 2
        t_idx = 0
        if transparent_index is not None:
            packed |= 1
            t_idx = int(transparent_index)
        out += b"\x21\xf9\x04" + bytes([packed]) + struct.pack("<H", 4) + bytes([t_idx, 0])
        # image descriptor (no local palette)
        fh, fw = f.shape
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh)
        out.append(0x40 if interlace else 0x00)
        raster = f
        if interlace:
            raster = f[_gif_interlace_order(fh)]
        out.append(min_code)
        out += _lzw_encode(raster, min_code)
    out.append(0x3B)
    return bytes(out)


def gif_decode(data: bytes) -> np.ndarray:
    """Decode a GIF to composited frames: (n_frames, H, W, 3) uint8 RGB
    over the logical screen, honoring sub-rectangle placement, local
    palettes, interlacing, transparency, and disposal methods 0-3.
    Non-GIF magic (MP4 and friends — no stdlib container/DCT support;
    that boundary is documented at the decoder seam) raises
    :class:`UnsupportedContainerError`, a ``ValueError`` subclass, so
    callers can tell 'codec absent for this container' from 'corrupt
    GIF record' (plain ``ValueError``, raised for truncated/corrupt
    streams) while fail-closed ``except ValueError`` handlers keep
    catching both (ADVICE r7 — the old stub raised
    ``NotImplementedError`` here)."""
    if len(data) < 6:
        # a short payload whose bytes prefix-match a GIF signature is a
        # TRUNCATED GIF (corrupt record — plain ValueError), not an
        # unsupported container: callers route the two differently
        # (ADVICE r8). Empty payloads carry no signature evidence and
        # stay unsupported-container.
        if data and any(sig.startswith(data) for sig in _GIF_SIGS):
            raise ValueError("truncated GIF header")
        raise UnsupportedContainerError(
            "not a GIF file (only container stdlib can decode); wire "
            "pyav/ffmpeg at the decoder seam for MP4 and friends"
        )
    if data[:6] not in _GIF_SIGS:
        raise UnsupportedContainerError(
            "not a GIF file (only container stdlib can decode); wire "
            "pyav/ffmpeg at the decoder seam for MP4 and friends"
        )
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    bg_idx = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x7)
        if pos + 3 * n > len(data):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n

    bg_rgb = gct[bg_idx] if gct is not None and bg_idx < len(gct) else np.zeros(3, np.uint8)
    # The canvas is allocated LAZILY, on the first validated frame: a
    # corrupt stream whose header happens to carry garbage dimensions
    # (e.g. ASCII bytes read as 30k×30k) must be rejected by block
    # parsing in microseconds, not after a multi-GB allocate-and-fill
    # — the rejection path runs per corrupt payload inside batch jobs.
    canvas: np.ndarray | None = None
    frames: list[np.ndarray] = []
    disposal = 0
    transparent: int | None = None

    while True:
        if pos >= len(data):
            raise ValueError("GIF missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated extension")
            label = data[pos]
            pos += 1
            payload, pos = _gif_subblocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                disposal = (payload[0] >> 2) & 0x7
                transparent = payload[3] if payload[0] & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x7)
            if pos + 3 * n > len(data):
                raise ValueError("truncated local color table")
            pal = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("image with no color table")
        if left + fw > w or top + fh > h:
            raise ValueError("frame rectangle outside logical screen")
        if pos >= len(data):
            raise ValueError("truncated image data")
        min_code = data[pos]
        pos += 1
        lzw, pos = _gif_subblocks(data, pos)
        idx = _lzw_decode(lzw, min_code, fw * fh).reshape(fh, fw)
        if ipacked & 0x40:  # deinterlace
            de = np.empty_like(idx)
            de[_gif_interlace_order(fh)] = idx
            idx = de
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")

        if canvas is None:
            canvas = np.empty((h, w, 3), dtype=np.uint8)
            canvas[:] = bg_rgb
        saved = canvas[top : top + fh, left : left + fw].copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        rgb = pal[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg_rgb
        elif disposal == 3:
            canvas[top : top + fh, left : left + fw] = saved
        disposal = 0
        transparent = None

    if not frames:
        raise ValueError("GIF contains no frames")
    return np.stack(frames)


def gif_frames_decoder(kind: str, payload: bytes, meta: dict):
    """Decoder-seam adapter (``sample_frames`` contract): real GIF decode
    → (n_frames, H, W, 3) uint8 stack; ``None`` for undecodable payloads
    — the documented rejection path."""
    try:
        return gif_decode(bytes(payload))
    except ValueError:
        return None
