"""Point-cloud IO & visualization helpers.

Equivalents of the reference's vendored utilities (SURVEY.md §2.2):
``plyfile.py`` (916 LoC generic PLY library — here a focused ascii/binary
PLY reader/writer for xyz[+rgb] clouds), ``pc_util.py`` (point cloud ->
image rendering, ply/obj export), and ``indoor3d_util.point_label_to_obj``
(colored room OBJ export).
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

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


def read_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read an xyz[+rgb] PLY written by :func:`write_ply` (ascii or binary).

    Returns (points [N,3] f32, colors [N,3] uint8 or None).
    """
    with open(path, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode().strip()
            header_lines.append(line)
            if line == "end_header":
                break
        fmt = next(l for l in header_lines if l.startswith("format")).split()[1]
        n = int(next(l for l in header_lines if l.startswith("element vertex")).split()[-1])
        has_rgb = any("red" in l for l in header_lines)
        if fmt == "ascii":
            rows = [f.readline().decode().split() for _ in range(n)]
            arr = np.asarray(rows, np.float64)
        else:
            rec = "<fff" + ("BBB" if has_rgb else "")
            size = struct.calcsize(rec)
            arr = np.asarray(
                [struct.unpack(rec, f.read(size)) for _ in range(n)],
                np.float64,
            )
    pts = arr[:, 0:3].astype(np.float32)
    colors = arr[:, 3:6].astype(np.uint8) if has_rgb else None
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
