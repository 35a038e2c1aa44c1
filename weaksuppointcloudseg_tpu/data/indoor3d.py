"""Raw S3DIS (Stanford 3D Indoor) room collection.

Rebuild of Dataset/S3DIS/indoor3d_util.py:37-81 (``collect_point_label``) and
Dataset/S3DIS/collect_indoor3d_data.py: aggregate every per-instance
annotation file of a room into one XYZRGBL array, shift the min corner to the
origin, and save per-room ``.npy`` files named ``Area_<k>_<room>.npy``.

Unknown classes (e.g. the 'staris' typo rooms) map to 'clutter'
(indoor3d_util.py:55-57); loadtxt failures are reported, not silently
swallowed like the reference's bare except (:58-60).
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Sequence

import numpy as np

S3DIS_CLASSES: List[str] = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door",
    "table", "chair", "sofa", "bookcase", "board", "clutter",
]
CLASS2LABEL = {c: i for i, c in enumerate(S3DIS_CLASSES)}

CLASS2COLOR = {
    "ceiling": [0, 255, 0], "floor": [0, 0, 255], "wall": [0, 255, 255],
    "beam": [255, 255, 0], "column": [255, 0, 255], "window": [100, 100, 255],
    "door": [200, 200, 100], "table": [170, 120, 200], "chair": [255, 0, 0],
    "sofa": [200, 100, 100], "bookcase": [10, 200, 100],
    "board": [200, 200, 200], "clutter": [50, 50, 50],
}


def collect_point_label(anno_path: str, out_filename: str,
                        file_format: str = "numpy") -> np.ndarray:
    """Aggregate one room's Annotations/*.txt into an [N, 7] XYZRGBL array.

    The min XYZ corner is shifted to the origin before saving
    (indoor3d_util.py:63-65).
    """
    points_list = []
    for f in sorted(glob.glob(os.path.join(anno_path, "*.txt"))):
        cls = os.path.basename(f).split("_")[0]
        if cls not in CLASS2LABEL:
            cls = "clutter"
        points = np.loadtxt(f)
        labels = np.full((points.shape[0], 1), CLASS2LABEL[cls], np.float64)
        points_list.append(np.concatenate([points, labels], axis=1))

    data_label = np.concatenate(points_list, axis=0)
    data_label[:, 0:3] -= data_label[:, 0:3].min(axis=0)

    if file_format == "numpy":
        np.save(out_filename, data_label)
    elif file_format == "txt":
        np.savetxt(out_filename, data_label,
                   fmt="%f %f %f %d %d %d %d".split())
    else:
        raise ValueError(f"unknown file format {file_format!r}")
    return data_label


def collect_indoor3d_data(
    raw_root: str,
    output_folder: str,
    anno_paths: Optional[Sequence[str]] = None,
) -> List[str]:
    """Convert the raw Stanford3dDataset tree to per-room .npy files.

    Args:
      raw_root: path to Stanford3dDataset_v1.2_Aligned_Version.
      output_folder: where Area_<k>_<room>.npy files land.
      anno_paths: relative Annotations/ dirs; discovered by glob if omitted.

    Returns the list of written file paths.
    """
    if anno_paths is None:
        anno_paths = sorted(
            os.path.relpath(p, raw_root)
            for p in glob.glob(os.path.join(raw_root, "Area_*", "*", "Annotations"))
        )
    os.makedirs(output_folder, exist_ok=True)
    written = []
    for rel in anno_paths:
        parts = rel.rstrip("/").split("/")
        out_name = f"{parts[-3]}_{parts[-2]}.npy"
        out_path = os.path.join(output_folder, out_name)
        if os.path.exists(out_path):
            written.append(out_path)
            continue
        try:
            collect_point_label(os.path.join(raw_root, rel), out_path, "numpy")
        except Exception as e:  # one bad room shouldn't kill the batch job
            print(f"{rel}: ERROR {e}")
            continue
        written.append(out_path)
    return written


def write_area_meta(output_folder: str, meta_dir: str, area: int) -> str:
    """Write meta/area<k>_data_label.txt listing that area's room files
    (the file S3DISTestRooms consumes; reference ships it prebuilt)."""
    rooms = sorted(
        f for f in os.listdir(output_folder)
        if f.startswith(f"Area_{area}_") and f.endswith(".npy")
    )
    os.makedirs(meta_dir, exist_ok=True)
    path = os.path.join(meta_dir, f"area{area}_data_label.txt")
    base = os.path.basename(output_folder.rstrip("/"))
    with open(path, "w") as f:
        f.write("\n".join(os.path.join(base, r) for r in rooms) + "\n")
    return path


# --- dormant reference helpers (rebuilt for completeness) ------------------
# room2samples* (indoor3d_util.py:270-345): whole-room shuffled chunking —
# the alternative to the 1m-block sampler; bbox extraction / visualization
# (:347-594): detection-style exports. Nothing on the live path calls these.


def _iter_instance_files(anno_path: str):
    for f in sorted(glob.glob(os.path.join(anno_path, "*.txt"))):
        cls = os.path.basename(f).split("_")[0]
        if cls not in CLASS2LABEL:  # 'staris' typo rooms -> clutter
            cls = "clutter"
        yield f, CLASS2LABEL[cls]


def room_to_samples(
    data: np.ndarray,   # [N, 6] XYZRGB (RGB in [0, 1], min corner at origin)
    label: np.ndarray,  # [N]
    num_point: int,
    rng: Optional[np.random.Generator] = None,
):
    """Whole-room shuffled chunking (indoor3d_util.py:270-304): shuffle the
    room, split into ceil(N/num_point) chunks, pad the last with random
    points. Returns ([K, num_point, 6], [K, num_point, 1])."""
    rng = rng or np.random.default_rng()
    n = data.shape[0]
    order = rng.permutation(n)
    data, label = data[order], label[order]
    k = -(-n // num_point)
    pad = k * num_point - n
    if pad:
        makeup = rng.integers(0, n, pad)
        data = np.concatenate([data, data[makeup]])
        label = np.concatenate([label, label[makeup]])
    return (data.reshape(k, num_point, 6),
            label.reshape(k, num_point, 1).astype(np.uint8))


def room_to_samples_normalized(
    data_label: np.ndarray,  # [N, 7] XYZRGBL, RGB in [0, 255]
    num_point: int,
    rng: Optional[np.random.Generator] = None,
):
    """room_to_samples + the 9-channel featurization
    (indoor3d_util.py:306-330). NOTE reference semantics kept exactly:
    unlike room2blocks_plus_normalized, the raw XYZ channels are NOT
    centered per chunk (the centering lines are commented out in the
    reference) — channels 0:3 stay room coordinates, 6:9 are
    room-max-normalized."""
    data = data_label[:, 0:6].copy()
    data[:, 3:6] /= 255.0
    label = data_label[:, -1].astype(np.uint8)
    max_room = data[:, 0:3].max(axis=0)
    batch, labels = room_to_samples(data, label, num_point, rng)
    out = np.zeros((batch.shape[0], num_point, 9), batch.dtype)
    out[:, :, 0:6] = batch
    out[:, :, 6:9] = batch[:, :, 0:3] / max_room
    return out, labels


def collect_bounding_box(anno_path: str, out_filename: str) -> None:
    """Per-instance axis-aligned bounding boxes of one room
    (indoor3d_util.py:347-388): each line x1 y1 z1 x2 y2 z2 label, room
    shifted so the most negative bbox corner is the origin."""
    rows = []
    for f, label in _iter_instance_files(anno_path):
        pts = np.loadtxt(f)[:, 0:3]
        rows.append(np.concatenate(
            [pts.min(axis=0), pts.max(axis=0), [label]]))
    bbox = np.stack(rows)
    shift = bbox[:, 0:3].min(axis=0)
    bbox[:, 0:3] -= shift
    bbox[:, 3:6] -= shift
    with open(out_filename, "w") as f:
        for r in bbox:
            f.write("%f %f %f %f %f %f %d\n" % tuple(r))


def collect_point_bounding_box(anno_path: str, out_filename: str,
                               file_format: str = "txt") -> None:
    """Per-POINT bbox attributes (indoor3d_util.py:531-594): each row is
    XYZRGBL + (offset to its instance-box center) + (box half-extents);
    room shifted to the origin. txt or numpy output."""
    rows = []
    for f, label in _iter_instance_files(anno_path):
        pts = np.loadtxt(f)  # [N, 6]
        mn, mx = pts[:, 0:3].min(axis=0), pts[:, 0:3].max(axis=0)
        center, half = (mn + mx) / 2, (mx - mn) / 2
        n = pts.shape[0]
        rows.append(np.concatenate([
            pts, np.full((n, 1), label), center - pts[:, 0:3],
            np.broadcast_to(half, (n, 3)),
        ], axis=1))  # [N, 13]
    out = np.concatenate(rows)
    out[:, 0:3] -= out[:, 0:3].min(axis=0)
    if file_format == "txt":
        with open(out_filename, "w") as f:
            for r in out:
                f.write("%f %f %f %d %d %d %d %f %f %f %f %f %f\n"
                        % tuple(r))
    elif file_format == "numpy":
        np.save(out_filename, out)
    else:
        raise ValueError(f"unknown file format {file_format!r}")


def bbox_label_to_obj(input_filename: str, out_filename_prefix: str,
                      easy_view: bool = False) -> None:
    """Wavefront OBJ + MTL visualization of instance boxes
    (indoor3d_util.py:389-450): one colored cuboid per bbox line; with
    ``easy_view`` only furniture-ish classes and the floor are drawn."""
    bbox = np.loadtxt(input_filename).reshape(-1, 7)
    easy_classes = {CLASS2LABEL[c] for c in
                    ("table", "chair", "sofa", "bookcase", "board", "floor")}
    obj_path = out_filename_prefix + ".obj"
    mtl_path = out_filename_prefix + ".mtl"
    # unit-cube corner offsets / quad faces (1-indexed, per-box)
    corners = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                        for x in (0, 1)], float)
    quads = [(1, 2, 4, 3), (5, 6, 8, 7), (1, 2, 6, 5),
             (3, 4, 8, 7), (1, 3, 7, 5), (2, 4, 8, 6)]
    with open(obj_path, "w") as obj, open(mtl_path, "w") as mtl:
        obj.write(f"mtllib {os.path.basename(mtl_path)}\n")
        v_base = 0
        for i, row in enumerate(bbox):
            label = int(row[6])
            if easy_view and label not in easy_classes:
                continue
            color = np.asarray(
                CLASS2COLOR[S3DIS_CLASSES[label]], float) / 255.0
            mtl.write(f"newmtl box{i}\nKd {color[0]} {color[1]} "
                      f"{color[2]}\n")
            obj.write(f"usemtl box{i}\n")
            lo, hi = row[0:3], row[3:6]
            for c in corners:
                p = lo + c * (hi - lo)
                obj.write(f"v {p[0]} {p[1]} {p[2]}\n")
            for q in quads:
                obj.write("f " + " ".join(str(v_base + j) for j in q) + "\n")
            v_base += 8
