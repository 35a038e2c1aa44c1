"""Dataset-preparation helpers: h5 export/import, PLY, padding.

Equivalent capability to the reference's vendored
Networks/dgcnn/utils/data_prep_util.py (dormant — the live loaders read h5
through data/shapenet.py / data/s3dis.py; these helpers exist so a user
preparing NEW h5 shards or PLY exports has the same toolbox). The h5 field
names match the reference exactly (``data``/``label``/``pid``/``normal``,
gzip compression) so files interchange with the original tooling.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


def save_h5(h5_filename: str, data, label,
            data_dtype: str = "uint8", label_dtype: str = "uint8") -> None:
    """data + label, gzip-compressed (data_prep_util.py:79-89)."""
    import h5py

    with h5py.File(h5_filename, "w") as f:
        f.create_dataset("data", data=data, compression="gzip",
                         compression_opts=4, dtype=data_dtype)
        f.create_dataset("label", data=label, compression="gzip",
                         compression_opts=1, dtype=label_dtype)


def save_h5_data_label_normal(
    h5_filename: str, data, label, normal,
    data_dtype: str = "float32", label_dtype: str = "uint8",
    normal_dtype: str = "float32",
) -> None:
    """data + label + normal (data_prep_util.py:60-75; fixes the
    reference's ``noral_dtype`` typo that makes its normal dtype arg dead)."""
    import h5py

    with h5py.File(h5_filename, "w") as f:
        f.create_dataset("data", data=data, compression="gzip",
                         compression_opts=4, dtype=data_dtype)
        f.create_dataset("normal", data=normal, compression="gzip",
                         compression_opts=4, dtype=normal_dtype)
        f.create_dataset("label", data=label, compression="gzip",
                         compression_opts=1, dtype=label_dtype)


def save_h5_data_label_seg(
    h5_filename: str, data, label, seg,
    data_dtype: str = "float32", label_dtype: str = "uint8",
    seg_dtype: str = "uint8",
) -> None:
    """data + label + per-point ``pid`` — the ShapeNet shard layout the
    loaders consume (DataIO_ShapeNet.py:317-325)."""
    import h5py

    with h5py.File(h5_filename, "w") as f:
        f.create_dataset("data", data=data, compression="gzip",
                         compression_opts=4, dtype=data_dtype)
        f.create_dataset("label", data=label, compression="gzip",
                         compression_opts=1, dtype=label_dtype)
        f.create_dataset("pid", data=seg, compression="gzip",
                         compression_opts=1, dtype=seg_dtype)


def load_h5(h5_filename: str) -> Tuple[np.ndarray, np.ndarray]:
    import h5py

    with h5py.File(h5_filename, "r") as f:
        return f["data"][:], f["label"][:]


def load_h5_data_label_normal(h5_filename: str):
    import h5py

    with h5py.File(h5_filename, "r") as f:
        return f["data"][:], f["label"][:], f["normal"][:]


def load_h5_data_label_seg(h5_filename: str):
    import h5py

    with h5py.File(h5_filename, "r") as f:
        return f["data"][:], f["label"][:], f["pid"][:]


def export_ply(pc: np.ndarray, filename: str) -> None:
    """ASCII PLY export of an [N, 3] cloud (data_prep_util.py:15-20)."""
    from weaksuppointcloudseg_tpu.utils.pointcloud_io import write_ply

    write_ply(filename, np.asarray(pc))


def load_ply_data(filename: str, point_num: int) -> np.ndarray:
    """First ``point_num`` vertices of a PLY file (data_prep_util.py:119-123)."""
    from weaksuppointcloudseg_tpu.utils.pointcloud_io import read_ply

    points, _ = read_ply(filename)
    return points[:point_num]


def pad_arr_rows(arr: np.ndarray, row: int, pad: str = "edge") -> np.ndarray:
    """Pad/truncate a 2-D array to exactly ``row`` rows
    (data_prep_util.py:134-145)."""
    arr = np.asarray(arr)
    assert arr.ndim == 2
    if arr.shape[0] >= row:
        return arr[:row]
    return np.pad(arr, ((0, row - arr.shape[0]), (0, 0)), pad)


def batch_mkdir(output_folder: str, subdir_list: List[str]) -> None:
    """mkdir -p a folder tree (data_prep_util.py:48-56)."""
    os.makedirs(output_folder, exist_ok=True)
    for subdir in subdir_list:
        os.makedirs(os.path.join(output_folder, subdir), exist_ok=True)
