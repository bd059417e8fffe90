"""Minimal self-contained OpenEXR scanline codec (numpy only).

The reference pipeline stores all depthmaps as .exr written by OpenCV
(e.g. datasets_preprocess/preprocess_blendedMVS.py there); OpenCV builds
increasingly ship WITHOUT OpenEXR (CVE-2021-3474 era opt-out - the very
reason for the OPENCV_IO_ENABLE_OPENEXR env gate). This module makes the
data layer self-sufficient: `imread_cv2` falls back to `read_exr` when
cv2 can't decode, and the preprocess scripts fall back to `write_exr`.

Supported subset (everything cv2/the reference pipeline produces):
  * single-part scanline images, increasing line order
  * pixel types HALF and FLOAT
  * compression NONE, ZIPS (1 line/block) and ZIP (16 lines/block)
  * 1-channel (Y) or 3-channel (B/G/R) images

Format per the OpenEXR 2.0 spec (openexr.com/en/latest/OpenEXRFileLayout):
magic 0x01312f76, version, attribute list, scanline offset table, then
per-block [y:int32][size:int32][data]. ZIP data is zlib over a
byte-interleave + delta predictor transform (ImfZip semantics).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 20000630
_PIXEL_HALF, _PIXEL_FLOAT = 1, 2
_COMP_NONE, _COMP_ZIPS, _COMP_ZIP = 0, 2, 3
_LINES_PER_BLOCK = {_COMP_NONE: 1, _COMP_ZIPS: 1, _COMP_ZIP: 16}
_DTYPES = {_PIXEL_HALF: np.dtype("<f2"), _PIXEL_FLOAT: np.dtype("<f4")}


# ---------------------------------------------------------------- predictor

def _predictor_encode(raw: bytes) -> bytes:
    """ImfZip compress transform: byte de-interleave, then delta."""
    a = np.frombuffer(raw, np.uint8)
    half = (len(a) + 1) // 2
    t = np.empty_like(a)
    t[:half] = a[0::2]
    t[half:] = a[1::2]
    d = t.astype(np.int16)
    d[1:] = d[1:] - d[:-1] + 128
    return d.astype(np.uint8).tobytes()


def _predictor_decode(buf: bytes) -> bytes:
    a = np.frombuffer(buf, np.uint8).astype(np.uint8)
    # t[i] = t[i-1] + t[i] - 128 (sequential prefix): cumsum mod 256
    d = a.astype(np.int64)
    d[1:] -= 128
    t = np.cumsum(d, dtype=np.int64).astype(np.uint8)
    half = (len(t) + 1) // 2
    out = np.empty_like(t)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


# ------------------------------------------------------------------ header

def _read_cstr(buf, pos):
    end = buf.index(b"\0", pos)
    return buf[pos:end].decode("latin-1"), end + 1


def _parse_channels(data):
    """chlist attribute -> ordered [(name, pixel_type)], file order."""
    chans = []
    pos = 0
    while data[pos] != 0:
        name, pos = _read_cstr(data, pos)
        ptype, = struct.unpack_from("<i", data, pos)
        pos += 16  # pixel_type + pLinear/reserved + xSampling + ySampling
        chans.append((name, ptype))
    return chans


def read_exr(path_or_bytes):
    """Read a (subset-)EXR file -> float32 array (H, W) or (H, W, 3)."""
    if isinstance(path_or_bytes, bytes):
        buf = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()

    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _MAGIC:
        raise ValueError("not an EXR file")
    if version & 0x200 or version & 0x1000:
        raise NotImplementedError("tiled/multipart EXR not supported")

    pos = 8
    attrs = {}
    while buf[pos] != 0:
        name, pos = _read_cstr(buf, pos)
        _type, pos = _read_cstr(buf, pos)
        size, = struct.unpack_from("<i", buf, pos)
        pos += 4
        attrs[name] = buf[pos:pos + size]
        pos += size
    pos += 1  # header terminator

    xmin, ymin, xmax, ymax = struct.unpack("<4i", attrs["dataWindow"])
    W, H = xmax - xmin + 1, ymax - ymin + 1
    comp = attrs["compression"][0]
    if comp not in _LINES_PER_BLOCK:
        raise NotImplementedError(f"EXR compression {comp} not supported "
                                  "(only NONE/ZIP/ZIPS)")
    chans = _parse_channels(attrs["channels"])
    dtypes = [_DTYPES[t] for _, t in chans]
    row_bytes = sum(d.itemsize for d in dtypes) * W

    lpb = _LINES_PER_BLOCK[comp]
    n_blocks = (H + lpb - 1) // lpb
    pos += 8 * n_blocks  # skip the offset table; blocks follow in order

    planes = {name: np.empty((H, W), np.float32) for name, _ in chans}
    for _ in range(n_blocks):
        y, size = struct.unpack_from("<ii", buf, pos)
        pos += 8
        data = buf[pos:pos + size]
        pos += size
        y0 = y - ymin
        n_lines = min(lpb, H - y0)
        raw_size = row_bytes * n_lines
        if comp != _COMP_NONE and size < raw_size:
            data = _predictor_decode(zlib.decompress(data))
        for li in range(n_lines):
            off = li * row_bytes
            for (name, _), dt in zip(chans, dtypes):
                n = W * dt.itemsize
                planes[name][y0 + li] = np.frombuffer(
                    data[off:off + n], dt).astype(np.float32)
                off += n

    names = [n for n, _ in chans]
    if len(names) == 1:
        return planes[names[0]]
    if sorted(names) == ["B", "G", "R"]:
        return np.stack([planes["R"], planes["G"], planes["B"]], axis=-1)
    return np.stack([planes[n] for n in sorted(names)], axis=-1)


# ------------------------------------------------------------------ writer

def imwrite_exr(path, img):
    """Write a float image as .exr: cv2 when its OpenEXR codec is present
    (faster; arbitrary compressions), else the built-in writer."""
    import cv2

    try:
        if cv2.imwrite(path, np.asarray(img)):
            return
    except cv2.error:
        pass
    write_exr(path, img)


def _attr(name, typ, data):
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<i", len(data)) + data)


def _chlist(names, ptype):
    out = b""
    for n in sorted(names):  # EXR requires alphabetical channel order
        out += (n.encode() + b"\0" + struct.pack("<i", ptype)
                + b"\0\0\0\0" + struct.pack("<ii", 1, 1))
    return out + b"\0"


def write_exr(path, img, half=False, compression="zip"):
    """Write (H, W) or (H, W, 3) float array as scanline EXR."""
    img = np.asarray(img)
    if img.ndim == 2:
        names = ["Y"]
        planes = {"Y": img}
    elif img.ndim == 3 and img.shape[2] == 3:
        names = ["B", "G", "R"]
        planes = {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]}
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    H, W = img.shape[:2]
    ptype = _PIXEL_HALF if half else _PIXEL_FLOAT
    dt = _DTYPES[ptype]
    comp = {"none": _COMP_NONE, "zips": _COMP_ZIPS, "zip": _COMP_ZIP}[
        compression]
    lpb = _LINES_PER_BLOCK[comp]

    header = b""
    header += _attr("channels", "chlist", _chlist(names, ptype))
    header += _attr("compression", "compression", bytes([comp]))
    box = struct.pack("<4i", 0, 0, W - 1, H - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\0")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    sorted_names = sorted(names)
    blocks = []
    for y0 in range(0, H, lpb):
        n_lines = min(lpb, H - y0)
        raw = b"".join(
            np.ascontiguousarray(planes[n][y0 + li]).astype(dt).tobytes()
            for li in range(n_lines) for n in sorted_names)
        if comp == _COMP_NONE:
            data = raw
        else:
            data = zlib.compress(_predictor_encode(raw))
            if len(data) >= len(raw):  # spec: store raw if zip doesn't help
                data = raw
        blocks.append((y0, data))

    base = 8 + len(header) + 8 * len(blocks)
    offsets = []
    pos = base
    for y0, data in blocks:
        offsets.append(pos)
        pos += 8 + len(data)

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _MAGIC, 2))
        f.write(header)
        f.write(struct.pack(f"<{len(offsets)}Q", *offsets))
        for (y0, data) in blocks:
            f.write(struct.pack("<ii", y0, len(data)))
            f.write(data)
