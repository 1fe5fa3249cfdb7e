"""Mesh / voxel file IO: OBJ read+write, binvox RLE, npy and .mat voxels.

Numpy rebuild of the reference serialization module (reference:
utils/serialization.py). Same formats and conventions: OBJ faces are written
1-based (serialization.py:35-37) and read back 0-based with sliding-window (strip)
polygon triangulation (117-121, 129-132); binvox payloads are (value, count) RLE pairs
reshaped to dims and transposed xzy -> xyz (44-92).
"""
from __future__ import annotations

import os
import sys
from collections import namedtuple

import numpy as np

Mesh = namedtuple("Mesh", ["vertices", "faces"])

# Native C fast path (csrc/fastio.c): ~10-30x faster OBJ parse / binvox RLE decode
# than the Python tokenisers — the host data path is single-core here and becomes
# the bottleneck at TPU step rates. Falls back to pure Python transparently.
_fastio = None
try:
    _csrc = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc")
    sys.path.insert(0, _csrc)
    try:
        import fastio as _fastio  # already built
    except ImportError:
        try:
            from build import build as _build_fastio  # csrc/build.py
            _build_fastio()
            import fastio as _fastio
        except Exception:
            _fastio = None
    finally:
        sys.path.remove(_csrc)
except Exception:
    _fastio = None


def save_voxels(voxels, filename: str, threshold: float = 0.5) -> None:
    """Binarise and save an occupancy grid as .npy int32 (reference: 13-18)."""
    voxels = np.asarray(voxels)
    np.save(filename, (voxels > threshold).astype(np.int32))


def save_mesh(vertices, faces, filename: str) -> None:
    """Write an OBJ file with 1-based face indices (reference: 21-41)."""
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    if faces.size and faces.min() == 0:
        faces = faces + 1
    if not filename.endswith(".obj"):
        filename = filename + ".obj"
    with open(filename, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")


def load_mesh(filename: str) -> Mesh:
    """Parse an OBJ file; polygons are strip-triangulated (reference: 109-138)."""
    filename = filename.replace(".binvox", ".obj")
    if _fastio is not None:
        with open(filename, "rb") as f:
            raw = f.read()
        vb, nv, fb, nf = _fastio.parse_obj(raw)
        vertices = np.frombuffer(vb, dtype=np.float32).reshape(nv, 3).copy()
        triangles = np.frombuffer(fb, dtype=np.int64 if np.dtype("long").itemsize == 8
                                  else np.int32).astype(np.int64).reshape(nf, 3)
        if triangles.size and triangles.min() == 1:
            triangles = triangles - 1
        assert triangles.size == 0 or triangles.min() == 0
        return Mesh(vertices, triangles)
    vertices = []
    triangles = []
    with open(filename) as file:
        for line in file:
            parts = line.strip(" \n").split(" ")
            if not parts:
                continue
            if parts[0] == "f":
                idx = [int(c.split("/")[0]) for c in parts[1:] if c]
                for i in range(len(idx) - 2):
                    triangles.append(idx[i:i + 3])
            elif parts[0] == "v":
                # filter empty tokens (runs of spaces, e.g. "v  1.9 0.1 0.5")
                vertices.append([float(c) for c in parts[1:] if c][:3])
    vertices = np.asarray(vertices, dtype=np.float32)
    triangles = np.asarray(triangles, dtype=np.int64)
    if triangles.size and triangles.min() == 1:
        triangles = triangles - 1
    assert triangles.size == 0 or triangles.min() == 0
    return Mesh(vertices, triangles)


def _read_binvox_header(fp):
    fp.readline()  # '#binvox 1'
    dims = list(map(int, fp.readline().strip().split(b" ")[1:]))
    translate = list(map(float, fp.readline().strip().split(b" ")[1:]))
    scale = list(map(float, fp.readline().strip().split(b" ")[1:]))[0]
    fp.readline()  # 'data'
    return dims, translate, scale


def read_binvox(fp, fix_coords: bool = True) -> np.ndarray:
    """Decode the binvox RLE payload into a dims^3 int grid (reference: 57-92)."""
    dims, _, _ = _read_binvox_header(fp)
    raw_bytes = fp.read()
    total = dims[0] * dims[1] * dims[2]
    if _fastio is not None:
        expanded = _fastio.decode_rle(raw_bytes, total)
        data = np.frombuffer(expanded, dtype=np.uint8).astype(bool).reshape(dims)
    else:
        raw = np.frombuffer(raw_bytes, dtype=np.uint8)
        values, counts = raw[::2], raw[1::2]
        data = np.repeat(values, counts).astype(bool).reshape(dims)
    if fix_coords:
        data = np.transpose(data, (0, 2, 1))  # xzy -> xyz
    return 1 * data


def load_voxels(path: str) -> np.ndarray:
    """Load .npy / .mat (scipy, pix3d) / .binvox occupancy grids (reference: 95-106)."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".mat"):
        import scipy.io
        return scipy.io.loadmat(path)["voxel"]
    assert path.endswith(".binvox"), f"unknown voxel format: {path}"
    with open(path, "rb") as f:
        return read_binvox(f)


def write_binvox(voxels: np.ndarray, path: str) -> None:
    """RLE-encode a boolean grid to binvox (inverse of read_binvox, for tooling)."""
    v = np.asarray(voxels).astype(bool)
    dims = v.shape
    flat = np.transpose(v, (0, 2, 1)).reshape(-1)  # xyz -> xzy raster
    out = bytearray()
    out += b"#binvox 1\n"
    out += f"dim {dims[0]} {dims[1]} {dims[2]}\n".encode()
    out += b"translate 0 0 0\n"
    out += b"scale 1\n"
    out += b"data\n"
    i = 0
    n = flat.size
    while i < n:
        val = flat[i]
        run = 1
        while i + run < n and flat[i + run] == val and run < 255:
            run += 1
        out.append(1 if val else 0)
        out.append(run)
        i += run
    with open(path, "wb") as f:
        f.write(bytes(out))
