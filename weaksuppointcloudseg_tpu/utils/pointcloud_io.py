"""Point-cloud IO & visualization helpers.

Equivalents of the reference's vendored utilities (SURVEY.md §2.2):
``plyfile.py`` (Networks/dgcnn/utils/plyfile.py — here :func:`read_ply_full`
covers the same ingestion breadth with a numpy-native parser: arbitrary
element/property layouts, all PLY scalar types, big- and little-endian
binary, and list properties; writing supports the xyz[+rgb] vertex layout
the pipeline produces), ``pc_util.py`` (point cloud -> image rendering,
ply/obj export), and ``indoor3d_util.point_label_to_obj`` (colored room OBJ
export).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np


# --- PLY ---------------------------------------------------------------


def write_ply(path: str, points: np.ndarray,
              colors: Optional[np.ndarray] = None,
              binary: bool = False) -> None:
    """Write an xyz[+rgb] PLY file. points [N,3] float; colors [N,3] 0-255."""
    n = len(points)
    props = ["property float x", "property float y", "property float z"]
    if colors is not None:
        props += ["property uchar red", "property uchar green",
                  "property uchar blue"]
    header = (
        "ply\nformat {} 1.0\nelement vertex {}\n{}\nend_header\n".format(
            "binary_little_endian" if binary else "ascii", n, "\n".join(props)
        )
    )
    if binary:
        with open(path, "wb") as f:
            f.write(header.encode())
            for i in range(n):
                f.write(struct.pack("<fff", *points[i]))
                if colors is not None:
                    f.write(struct.pack("<BBB", *(int(c) for c in colors[i])))
    else:
        with open(path, "w") as f:
            f.write(header)
            for i in range(n):
                row = "%f %f %f" % tuple(points[i])
                if colors is not None:
                    row += " %d %d %d" % tuple(int(c) for c in colors[i])
                f.write(row + "\n")


# PLY scalar type names (both spellings) -> numpy dtype codes (no byte order)
_PLY_TYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def _parse_ply_header(f):
    """-> (fmt, elements) with elements = [(name, count, props)] and each
    prop either ("scalar", name, dtype_code) or
    ("list", name, count_code, item_code)."""
    magic = f.readline().strip()
    if magic not in (b"ply", b"ply\r"):
        raise ValueError("not a PLY file (missing 'ply' magic)")
    fmt = None
    elements: List[tuple] = []
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unterminated PLY header")
        tokens = line.decode("ascii", "replace").split()
        if not tokens or tokens[0] == "comment" or tokens[0] == "obj_info":
            continue
        if tokens[0] == "format":
            fmt = tokens[1]
            if fmt not in ("ascii", "binary_little_endian",
                           "binary_big_endian"):
                raise ValueError(f"unknown PLY format {fmt!r}")
        elif tokens[0] == "element":
            elements.append((tokens[1], int(tokens[2]), []))
        elif tokens[0] == "property":
            if not elements:
                raise ValueError("property before any element")
            props = elements[-1][2]
            if tokens[1] == "list":
                props.append(("list", tokens[4], _PLY_TYPES[tokens[2]],
                              _PLY_TYPES[tokens[3]]))
            else:
                props.append(("scalar", tokens[2], _PLY_TYPES[tokens[1]]))
        elif tokens[0] == "end_header":
            break
    if fmt is None:
        raise ValueError("PLY header has no format line")
    return fmt, elements


def read_ply_full(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """General PLY reader: the rebuild of the reference's vendored
    ``plyfile.py`` ingestion surface (Networks/dgcnn/utils/plyfile.py).

    Supports ascii / binary_little_endian / binary_big_endian formats, all
    PLY scalar types (both ``uchar``/``uint8`` spellings), arbitrary
    element/property layouts, and list properties (e.g. face
    ``vertex_indices``).

    Returns ``{element_name: {property_name: array}}``; scalar properties
    are 1-D arrays of their native dtype, list properties are 1-D object
    arrays of per-row arrays (a common fixed length is NOT assumed).
    """
    out: Dict[str, Dict[str, np.ndarray]] = {}
    with open(path, "rb") as f:
        fmt, elements = _parse_ply_header(f)
        bo = {"ascii": "=", "binary_little_endian": "<",
              "binary_big_endian": ">"}[fmt]
        for name, count, props in elements:
            cols: Dict[str, np.ndarray] = {}
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                scalars = {p[1]: [] for p in props}
                lists = {p[1]: [] for p in props if p[0] == "list"}
                for row in rows:
                    pos = 0
                    for p in props:
                        if p[0] == "scalar":
                            scalars[p[1]].append(row[pos])
                            pos += 1
                        else:
                            ln = int(row[pos])
                            lists[p[1]].append(
                                np.asarray(row[pos + 1:pos + 1 + ln],
                                           dtype=np.dtype(p[3])))
                            pos += 1 + ln
                for p in props:
                    if p[0] == "scalar":
                        cols[p[1]] = np.asarray(scalars[p[1]],
                                                dtype=np.dtype(p[2]))
                    else:
                        arr = np.empty(count, object)
                        arr[:] = lists[p[1]]
                        cols[p[1]] = arr
            elif not any(p[0] == "list" for p in props):
                # fixed-record binary element: one vectorized fromfile
                dt = np.dtype([(p[1], bo + p[2]) for p in props])
                rec = np.frombuffer(f.read(dt.itemsize * count), dtype=dt,
                                    count=count)
                for p in props:
                    # native byte order on the way out (big-endian files
                    # must not leak '>f8'-style dtypes to callers)
                    cols[p[1]] = np.ascontiguousarray(rec[p[1]]).astype(
                        np.dtype(p[2]))
            else:
                # binary with list properties: per-row parse (variable
                # record length makes vectorization impossible in general)
                data: Dict[str, list] = {p[1]: [] for p in props}
                for _ in range(count):
                    for p in props:
                        if p[0] == "scalar":
                            dt = np.dtype(bo + p[2])
                            (v,) = np.frombuffer(f.read(dt.itemsize), dt)
                            data[p[1]].append(v)
                        else:
                            cdt = np.dtype(bo + p[2])
                            (ln,) = np.frombuffer(f.read(cdt.itemsize), cdt)
                            idt = np.dtype(bo + p[3])
                            data[p[1]].append(np.frombuffer(
                                f.read(idt.itemsize * int(ln)), idt,
                                count=int(ln)).astype(np.dtype(p[3])))
                for p in props:
                    if p[0] == "scalar":
                        cols[p[1]] = np.asarray(data[p[1]],
                                                dtype=np.dtype(p[2]))
                    else:
                        arr = np.empty(count, object)
                        arr[:] = data[p[1]]
                        cols[p[1]] = arr
            out[name] = cols
    return out


def read_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read the vertex cloud of any PLY file (ascii / binary, either
    endianness, any extra properties or elements — parsed via
    :func:`read_ply_full`).

    Returns (points [N,3] f32, colors [N,3] uint8 or None).
    """
    elems = read_ply_full(path)
    if "vertex" not in elems:
        raise ValueError(f"PLY file has no 'vertex' element: {path}")
    v = elems["vertex"]
    pts = np.stack([np.asarray(v[a], np.float32) for a in "xyz"], axis=1)
    colors = None
    if all(c in v for c in ("red", "green", "blue")):
        colors = np.stack(
            [np.asarray(v[c]).astype(np.uint8)
             for c in ("red", "green", "blue")], axis=1)
    return pts, colors


# --- OBJ (colored room export, indoor3d_util.point_label_to_obj) ---------


def write_obj(path: str, points: np.ndarray,
              colors: Optional[np.ndarray] = None) -> None:
    """Write points as OBJ vertices 'v x y z [r g b]' (colors 0-255 -> 0-1)."""
    with open(path, "w") as f:
        for i in range(len(points)):
            row = "v %f %f %f" % tuple(points[i])
            if colors is not None:
                row += " %f %f %f" % tuple(np.asarray(colors[i]) / 255.0)
            f.write(row + "\n")


def room_to_obj(data_label: np.ndarray, path: str,
                label_colors: Optional[dict] = None) -> None:
    """Export an XYZRGBL room colored by class label
    (indoor3d_util.py:84-112 equivalent)."""
    from weaksuppointcloudseg_tpu.data.indoor3d import CLASS2COLOR, S3DIS_CLASSES

    if label_colors is None:
        label_colors = {i: CLASS2COLOR[c] for i, c in enumerate(S3DIS_CLASSES)}
    labels = data_label[:, 6].astype(int)
    colors = np.asarray([label_colors.get(int(l), [128, 128, 128]) for l in labels])
    write_obj(path, data_label[:, 0:3], colors)


# --- point cloud -> image (pc_util.draw_point_cloud equivalent) ----------


def point_cloud_to_image(points: np.ndarray, resolution: int = 256,
                         radius: int = 1) -> np.ndarray:
    """Orthographic z-buffer-free splat of a point cloud to a [R, R] f32
    image (brightness = point density), xy plane, unit-sphere normalized."""
    pts = np.asarray(points, np.float64)
    pts = pts - pts.mean(axis=0)
    scale = np.max(np.linalg.norm(pts, axis=1)) or 1.0
    xy = (pts[:, :2] / scale + 1.0) / 2.0 * (resolution - 1)
    img = np.zeros((resolution, resolution), np.float32)
    xi = np.clip(xy[:, 0].round().astype(int), 0, resolution - 1)
    yi = np.clip(xy[:, 1].round().astype(int), 0, resolution - 1)
    np.add.at(img, (yi, xi), 1.0)
    if radius > 0:
        # cheap box blur to make sparse clouds visible
        from numpy.lib.stride_tricks import sliding_window_view  # noqa: F401
        kernel = 2 * radius + 1
        pad = np.pad(img, radius)
        out = np.zeros_like(img)
        for dy in range(kernel):
            for dx in range(kernel):
                out += pad[dy:dy + resolution, dx:dx + resolution]
        img = out
    m = img.max()
    return img / m if m > 0 else img


def point_cloud_to_volume(points: np.ndarray, vsize: int,
                          radius: float = 1.0) -> np.ndarray:
    """Binary occupancy voxelization of a cloud assumed inside a sphere of
    ``radius`` (pc_util.py:41-53): [vsize, vsize, vsize] float 0/1."""
    vol = np.zeros((vsize, vsize, vsize), np.float32)
    voxel = 2 * radius / vsize
    loc = ((np.asarray(points) + radius) / voxel).astype(int)
    loc = np.clip(loc, 0, vsize - 1)
    vol[loc[:, 0], loc[:, 1], loc[:, 2]] = 1.0
    return vol


def point_cloud_to_volume_batch(point_clouds: np.ndarray, vsize: int = 12,
                                radius: float = 1.0,
                                flatten: bool = True) -> np.ndarray:
    """Batch voxelization (pc_util.py:24-38): [B, vsize^3] when flattened,
    else [B, vsize, vsize, vsize, 1]."""
    vols = np.stack([point_cloud_to_volume(pc, vsize, radius)
                     for pc in point_clouds])
    if flatten:
        return vols.reshape(len(vols), -1)
    return vols[..., None]


def volume_to_point_cloud(vol: np.ndarray) -> np.ndarray:
    """Occupied-voxel indices as an [M, 3] cloud (pc_util.py:56-74)."""
    vol = np.asarray(vol)
    assert vol.ndim == 3 and len(set(vol.shape)) == 1
    return np.argwhere(vol > 0.5).astype(np.float32)


def point_cloud_three_views(points: np.ndarray,
                            resolution: int = 256) -> np.ndarray:
    """Concatenated depth renders from the reference's three rotated
    viewpoints — (z, x) = (110deg, 45deg), (70deg, 135deg), (180deg, 90deg)
    (pc_util.py:156-168, rotation M = euler2mat(zrot, yrot, xrot)):
    [resolution, 3 * resolution] grayscale."""
    from weaksuppointcloudseg_tpu.utils.rotations import euler2mat

    pts = np.asarray(points, np.float32)
    views = []
    for z_deg, x_deg in ((110, 45), (70, 135), (180, 90)):
        m = euler2mat(z=np.deg2rad(z_deg), x=np.deg2rad(x_deg))
        views.append(point_cloud_to_image(pts @ m.T.astype(np.float32),
                                          resolution))
    return np.concatenate(views, axis=1)
