"""Minimal pure-Python OpenEXR codec.

This container ships an OpenCV build with no EXR support, so the
reference's EXR fixtures (tests/checkerboard.exr) and the tutorials'
HDR outputs need a self-contained codec (reference pyredner/image.py
relies on OpenEXR-capable imageio).

Supported:
  * read — scanline images, compression NONE (0), ZIPS (2), ZIP (3);
    channel types HALF and FLOAT; lineOrder increasing or decreasing;
    arbitrary channel sets (R/G/B[/A] mapped to the output order, other
    sets returned alphabetically).
  * write — float32 RGB(A)/single-channel, compression NONE.

Format reference: the OpenEXR 2.0 file layout (openexr.com) — magic,
versioned header of named attributes, a scanline-offset table, then
per-chunk [y, byte_count, channel-interleaved rows].
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x76\x2f\x31\x01"
_HALF, _FLOAT, _UINT = 1, 2, 0


def _attr(name: str, typ: str, data: bytes) -> bytes:
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<i", len(data)) + data)


def write_exr(path: str, img) -> None:
    """Write (H, W), (H, W, 1), (H, W, 3) or (H, W, 4) float32 data."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    names = {1: ["Y"], 3: ["R", "G", "B"], 4: ["R", "G", "B", "A"]}[c]
    order = sorted(range(c), key=lambda i: names[i])  # file order: alpha

    chlist = b""
    for i in order:
        chlist += (names[i].encode() + b"\0" + struct.pack("<i", _FLOAT)
                   + b"\0\0\0\0" + struct.pack("<ii", 1, 1))
    chlist += b"\0"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = (
        _attr("channels", "chlist", chlist)
        + _attr("compression", "compression", b"\0")  # NONE
        + _attr("dataWindow", "box2i", box)
        + _attr("displayWindow", "box2i", box)
        + _attr("lineOrder", "lineOrder", b"\0")  # increasing y
        + _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
        + _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\0"
    )
    head = _MAGIC + struct.pack("<i", 2) + header
    table_pos = len(head)
    data_pos = table_pos + 8 * h
    line_bytes = 8 + c * w * 4
    offsets = [data_pos + y * line_bytes for y in range(h)]
    with open(path, "wb") as f:
        f.write(head)
        f.write(struct.pack(f"<{h}q", *offsets))
        for y in range(h):
            row = np.concatenate([img[y, :, i] for i in order])
            f.write(struct.pack("<ii", y, c * w * 4))
            f.write(row.astype("<f4").tobytes())


def _zip_undo(raw: bytes) -> bytes:
    """EXR zip post-processing: un-delta then de-interleave halves."""
    d = np.frombuffer(raw, np.uint8).astype(np.int16)
    d[1:] = d[1:] - 128
    d = np.cumsum(d, dtype=np.int64).astype(np.uint8)
    n = d.size
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = d[:half]
    out[1::2] = d[half:]
    return out.tobytes()


def read_exr(path: str) -> np.ndarray:
    """Read a scanline EXR -> float32 (H, W, C)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC:
        raise IOError(f"{path}: not an EXR file")
    version = struct.unpack("<i", data[4:8])[0]
    if version & 0x200:
        raise IOError(f"{path}: tiled EXR not supported")
    off = 8
    attrs = {}
    while data[off] != 0:
        e = data.index(b"\0", off)
        name = data[off:e].decode()
        off = e + 1
        e = data.index(b"\0", off)
        off = e + 1
        size = struct.unpack("<i", data[off:off + 4])[0]
        off += 4
        attrs[name] = data[off:off + size]
        off += size
    off += 1  # header terminator

    x0, y0, x1, y1 = struct.unpack("<4i", attrs["dataWindow"])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][0]
    decreasing = attrs.get("lineOrder", b"\0")[0] == 1

    chans = []  # (name, ptype) in FILE (alphabetical) order
    cl = attrs["channels"]
    o = 0
    while cl[o] != 0:
        e = cl.index(b"\0", o)
        cname = cl[o:e].decode()
        o = e + 1
        ptype = struct.unpack("<i", cl[o:o + 4])[0]
        o += 16
        chans.append((cname, ptype))
    dtypes = {_HALF: np.dtype("<f2"), _FLOAT: np.dtype("<f4"),
              _UINT: np.dtype("<u4")}
    if comp in (0,):
        lines_per_chunk = 1
    elif comp == 2:  # ZIPS
        lines_per_chunk = 1
    elif comp == 3:  # ZIP
        lines_per_chunk = 16
    else:
        raise IOError(
            f"{path}: compression {comp} not supported by the pure-Python "
            f"reader (NONE/ZIPS/ZIP only)")

    n_chunks = -(-h // lines_per_chunk)
    offsets = struct.unpack(f"<{n_chunks}q", data[off:off + 8 * n_chunks])

    out = {name: np.empty((h, w), np.float32) for name, _ in chans}
    bytes_per_line = sum(dtypes[pt].itemsize for _, pt in chans) * w
    for pos in offsets:
        y, nb = struct.unpack("<ii", data[pos:pos + 8])
        raw = data[pos + 8 : pos + 8 + nb]
        ny = min(lines_per_chunk, y1 - y + 1)
        expect = bytes_per_line * ny
        if comp in (2, 3):
            raw = zlib.decompress(raw)
            if len(raw) != expect:
                raise IOError(f"{path}: bad chunk size")
            raw = _zip_undo(raw)
        for li in range(ny):
            row = y - y0 + li
            o = li * bytes_per_line
            for cname, ptype in chans:
                dt = dtypes[ptype]
                n = w * dt.itemsize
                vals = np.frombuffer(raw[o:o + n], dt).astype(np.float32)
                o += n
                out[cname][row] = vals
    _ = decreasing  # y in each chunk header is absolute: order-agnostic

    names = [c for c, _ in chans]
    if set(names) >= {"R", "G", "B"}:
        sel = ["R", "G", "B"] + (["A"] if "A" in names else [])
    else:
        sel = sorted(names)
    return np.stack([out[c] for c in sel], axis=-1)
