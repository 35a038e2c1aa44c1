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
