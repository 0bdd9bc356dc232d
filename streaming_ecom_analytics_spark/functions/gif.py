"""Dependency-free GIF codec (pure Python/numpy) from the public
GIF87a/89a specification — LZW decompression included, so animated
and palettized web imagery decodes for REAL alongside PNG
(functions/imaging.py) and baseline JPEG (functions/jpeg.py).

Decoder scope: global/local color tables, interlacing, multiple
frames (returns each frame's palette-resolved RGB), graphic-control
transparency index honored as "carry previous frame's pixel"
(disposal method 1 compositing — the common web-GIF case; methods 2/3
degrade to the same, documented). Encoder: single-frame, global
palette built from the image's unique colors (≤256 required), real
variable-width LZW with code-table resets — exists so the decoder is
verified against an independent forward path, like jpeg.py's.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_gif(content: bytes) -> bool:
    return content[:6] in (b"GIF87a", b"GIF89a")


def _read_color_table(content: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    table = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
    return table, pos + n * 3


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavored LZW: variable code width, CLEAR/EOI codes, table
    capped at 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return eoi
        byte_i, bit_i = divmod(bitpos, 8)
        # little-endian bit packing: codes start at the LSB
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        bitpos += width
        return (chunk >> bit_i) & ((1 << width) - 1)

    table: list[bytes] = []

    def reset_table() -> int:
        nonlocal table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return min_code_size + 1

    width = reset_table()
    prev: bytes | None = None
    while n_out < n_pixels:
        code = read_code(width)
        if code == clear:
            width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("truncated GIF pixel data")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(content: bytes) -> list[np.ndarray]:
    """GIF bytes → list of uint8 RGB frames (H, W, 3), composited over
    the previous frame where a transparency index applies."""
    if not sniff_gif(content):
        raise ValueError("not a GIF (bad signature)")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    global_table = None
    if flags & 0x80:
        global_table, pos = _read_color_table(content, pos, 2 << (flags & 0x07))
    frames: list[np.ndarray] = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    transparent: int | None = None
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = content[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = content[pos]
                gflags = content[pos + 1]
                tindex = content[pos + 4]
                transparent = tindex if (gflags & 1) else None
                pos += 1 + size
            while content[pos] != 0:  # skip (remaining) sub-blocks
                pos += 1 + content[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", content, pos)
            pos += 9
            if left + iw > w or top + ih > h:
                raise ValueError("GIF frame exceeds logical screen")
            table = global_table
            if iflags & 0x80:
                table, pos = _read_color_table(content, pos, 2 << (iflags & 0x07))
            if table is None:
                raise ValueError("GIF frame without a color table")
            min_code = content[pos]
            pos += 1
            data = bytearray()
            while content[pos] != 0:
                n = content[pos]
                data += content[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, iw * ih).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: reorder rows by pass
                de = np.empty_like(idx)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, ih, step)
                    for r in rows:
                        de[r] = idx[src]
                        src += 1
                idx = de
            rgb = table[np.minimum(idx, len(table) - 1)]
            region = canvas[top : top + ih, left : left + iw]
            if transparent is not None:
                mask = (idx == transparent)[:, :, None]
                region[:] = np.where(mask, region, rgb)
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            transparent = None
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
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

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq = b""
    for px in indices.ravel().tobytes():
        cand = seq + bytes([px])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: reset (keeps the decoder honest)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([px])
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """uint8 RGB (H, W, 3) with ≤256 unique colors → single-frame
    GIF89a bytes (global palette, real LZW)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("GIF encoder requires <= 256 unique colors")
    # palette size must be a power of two, minimum 2 entries
    bits = max(1, int(len(colors) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    min_code = max(2, bits)
    lzw = _lzw_encode(idx.astype(np.uint8).reshape(h, w), min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
