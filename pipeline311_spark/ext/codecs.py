"""Stdlib-only media codecs: PNG (zlib deflate) and WAV (PCM).

These make the multimodal ``fake=False`` decode paths REAL in any
environment — no PIL/scipy/ffmpeg needed — while staying pure public
knowledge (PNG spec: RFC 2083 / ISO 15948; WAV via the stdlib ``wave``
module).  They are deliberately scoped to the formats a pipeline
controls end-to-end (its own staged artifacts):

* PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette —
  expanded to RGB/RGBA on decode via PLTE/tRNS), 4 (gray+alpha),
  6 (RGBA), non-interlaced; all five scanline filters (None / Sub /
  Up / Average / Paeth) are implemented on decode, so any compliant
  encoder's output of those shapes round-trips (validated against the
  PNGs shipped inside the Python standard distribution — see
  tests/test_codecs.py).
* WAV: integer PCM, 8/16/24/32-bit, any channel count (decoded to
  a mono mix when asked).

Anything outside that envelope raises ``ValueError`` with the reason —
the Spark operators treat that as "corrupt media" (null features / no
rows for the item), never a job abort.

Scale note: these run INSIDE Arrow-batched ``mapInPandas`` workers
(see ext/multimodal.py) — pure-Python per-item decode is the honest
cost model for media at 100 TB; swapping in a C decoder changes only
the function body, not the Spark plumbing.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: SCANLINE channels per PNG color type (8-bit depth only); type 3
#: (palette) carries 1 index byte per pixel on the wire and is
#: expanded to truecolor RGB/RGBA on decode
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 0,
    filter_type: int = 0,
) -> bytes:
    """Minimal compliant PNG encoder (8-bit, non-interlaced).

    ``pixels`` is the row-major raw sample stream
    (width·height·channels bytes).  ``filter_type`` applies ONE filter
    to every scanline (0..4) — useful for exercising all decoder
    filter paths; 0 (None) is the production default.  Palette output
    (color type 3) is decode-only — re-encodes are truecolor."""
    if color_type == 3:
        raise ValueError("palette PNGs are decode-only; encode truecolor (0/2/4/6)")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(f"pixels length {len(pixels)} != {stride * height}")
    if filter_type not in range(5):
        raise ValueError(f"bad filter type {filter_type}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        else:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if filter_type == 1:
                    raw.append((row[i] - a) & 0xFF)
                elif filter_type == 2:
                    raw.append((row[i] - b) & 0xFF)
                elif filter_type == 3:
                    raw.append((row[i] - (a + b) // 2) & 0xFF)
                else:
                    raw.append((row[i] - _paeth(a, b, c)) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixels)`` where
    ``pixels`` is the row-major unfiltered sample stream.  Raises
    ``ValueError`` on ANYTHING outside the supported envelope —
    including zlib/struct failures on truncated or corrupt payloads
    (review r6: a deflate stream cut mid-way raised ``zlib.error``,
    which escaped the operators' ValueError quarantine and aborted
    the job)."""
    try:
        return _decode_png_inner(payload)
    except (zlib.error, struct.error) as e:
        raise ValueError(f"corrupt PNG: {e}") from e


def _decode_png_inner(payload: bytes) -> tuple[int, int, int, bytes]:
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = color_type = None
    idat = bytearray()
    plte: bytes | None = None
    trns: bytes | None = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        crc_bytes = payload[pos + 8 + length : pos + 12 + length]
        if len(crc_bytes) != 4:
            raise ValueError("truncated chunk CRC")
        (crc,) = struct.unpack(">I", crc_bytes)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            if len(data) != 13:
                raise ValueError(f"bad IHDR length {len(data)}")
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            if comp or filt:
                raise ValueError("nonstandard compression/filter method")
        elif tag == b"PLTE":
            if len(data) % 3:
                raise ValueError("bad PLTE length")
            plte = data
        elif tag == b"tRNS":
            trns = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:
            for i in range(stride):
                row[i] = (row[i] + (row[i - ch] if i >= ch else 0)) & 0xFF
        elif ft == 2:
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad scanline filter {ft}")
        out += row
        prev = bytes(row)
    if color_type in (0, 2) and trns is not None:
        # tRNS on gray/truecolor is a COLOR KEY (2 bytes per sample,
        # big-endian; low byte carries the value at 8-bit depth):
        # pixels equal to the key become fully transparent — emit an
        # alpha channel rather than silently dropping transparency
        # (the same image saved palette+tRNS would decode to RGBA)
        if len(trns) != 2 * ch:
            raise ValueError(f"bad tRNS length {len(trns)} for color type {color_type}")
        key = bytes(trns[2 * i + 1] for i in range(ch))
        expanded = bytearray()
        for i in range(0, len(out), ch):
            px_val = bytes(out[i : i + ch])
            expanded += px_val
            expanded.append(0 if px_val == key else 255)
        return width, height, ch + 1, bytes(expanded)
    if color_type == 3:
        # palette expansion: 1-byte indices → RGB (or RGBA when a tRNS
        # alpha table is present); decode output is always truecolor
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        n_entries = len(plte) // 3
        if trns is not None:
            expanded = bytearray()
            for idx in out:
                if idx >= n_entries:
                    raise ValueError(f"palette index {idx} out of range")
                expanded += plte[idx * 3 : idx * 3 + 3]
                expanded.append(trns[idx] if idx < len(trns) else 255)
            return width, height, 4, bytes(expanded)
        expanded = bytearray()
        for idx in out:
            if idx >= n_entries:
                raise ValueError(f"palette index {idx} out of range")
            expanded += plte[idx * 3 : idx * 3 + 3]
        return width, height, 3, bytes(expanded)
    return width, height, ch, bytes(out)


def encode_wav(
    samples: list[int], framerate: int = 8000, sampwidth: int = 2, nchannels: int = 1
) -> bytes:
    """Integer-PCM WAV encoder via the stdlib ``wave`` module.
    ``samples`` are channel-interleaved signed ints (8/16/24/32-bit)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nchannels)
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        if sampwidth == 1:  # WAV 8-bit is unsigned
            w.writeframes(bytes((s + 128) & 0xFF for s in samples))
        elif sampwidth == 3:
            w.writeframes(
                b"".join(s.to_bytes(3, "little", signed=True) for s in samples)
            )
        else:
            fmt = {2: "<h", 4: "<i"}[sampwidth]
            w.writeframes(b"".join(struct.pack(fmt, s) for s in samples))
    return buf.getvalue()


def decode_wav(payload: bytes, mono: bool = True) -> tuple[int, int, list[int]]:
    """Decode integer-PCM WAV to ``(framerate, nchannels, samples)``.
    With ``mono=True`` multi-channel frames are averaged (floor
    division — exact integer semantics, mirrorable in SQL).  Raises
    ``ValueError`` outside the supported envelope."""
    # wave.open raises bare RuntimeError on some malformed headers and
    # struct.error on truncated chunks (review r6: both escaped a
    # wave.Error-only catch and aborted the job); everything maps to
    # the ValueError quarantine contract
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch, sw, fr, nframes = (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
                w.getnframes(),
            )
            raw = w.readframes(nframes)
    except (wave.Error, EOFError, struct.error, RuntimeError) as e:
        raise ValueError(f"not a PCM WAV: {e}") from e
    if sw not in (1, 2, 3, 4):
        raise ValueError(f"unsupported sample width {sw}")
    if len(raw) % (sw * nch):
        raise ValueError("data chunk truncated mid-frame")
    if sw == 1:
        vals = [b - 128 for b in raw]
    elif sw == 3:  # 24-bit: no struct code, decode 3-byte LE signed
        vals = [
            int.from_bytes(raw[i : i + 3], "little", signed=True)
            for i in range(0, len(raw), 3)
        ]
    else:
        fmt = {2: "h", 4: "i"}[sw]
        vals = list(struct.unpack(f"<{len(raw) // sw}{fmt}", raw))
    if mono and nch > 1:
        vals = [
            sum(vals[i : i + nch]) // nch for i in range(0, len(vals) - nch + 1, nch)
        ]
        nch_out = 1
    else:
        nch_out = nch
    return fr, nch_out, vals
