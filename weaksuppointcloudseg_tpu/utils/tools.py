"""Host-side toolbox: one-hot encoding, tee logging, result dirs.

Replaces Util/Tool.py's numpy helpers. ``OnehotEncode`` there is a triple
Python loop (Tool.py:4-28, a known slow spot) — here it's a vectorized
``np.eye`` take.
"""

from __future__ import annotations

import os
from typing import IO, Optional

import numpy as np


def onehot_encode(y: np.ndarray, num_classes: int, dtype=np.float32) -> np.ndarray:
    """One-hot encode integer labels of any shape -> shape + [num_classes].

    Uses the native C++ batcher (weaksuppointcloudseg_tpu/native.py) when
    built; numpy eye-take otherwise."""
    y = np.asarray(y)
    if dtype == np.float32:
        from weaksuppointcloudseg_tpu import native

        return native.onehot(y, num_classes)
    return np.eye(num_classes, dtype=dtype)[y]


def printout(msg: str, write_flag: bool = False, fid: Optional[IO] = None, end: str = ""):
    """Print and optionally tee to a file (Util/Tool.py:215-229 parity)."""
    print(msg, end=end)
    if write_flag and fid is not None:
        fid.write(msg + end)


class Summary:
    """Append-mode experiment summary writer.

    Reproduces the reference's result layout
    ``Results/<ds>/<Net>_sty-<Style>_m-<m>_<datetime>/{Summary,Prediction,Checkpoint}``
    (train_ShapeNet.py:56-78).
    """

    def __init__(self, base_path: Optional[str], enabled: bool = True):
        self.enabled = enabled and base_path is not None
        self.base_path = base_path
        if self.enabled:
            self.summary_dir = os.path.join(base_path, "Summary")
            self.pred_dir = os.path.join(base_path, "Prediction")
            self.ckpt_dir = os.path.join(base_path, "Checkpoint")
            for d in (base_path, self.summary_dir, self.pred_dir, self.ckpt_dir):
                os.makedirs(d, exist_ok=True)
            self.summary_file = os.path.join(self.summary_dir, "Summary.txt")
            open(self.summary_file, "w").close()
        else:
            self.summary_dir = self.pred_dir = self.ckpt_dir = None
            self.summary_file = None

    def log(self, msg: str, end: str = ""):
        print(msg, end=end)
        if self.enabled:
            with open(self.summary_file, "a") as fid:
                fid.write(msg + end)


def make_result_dirs(root: str, dataset: str, network: str, style: str,
                     m: float, timestamp: str) -> str:
    return os.path.join(
        root, "Results", dataset, f"{network}_sty-{style}_m-{m}_{timestamp}"
    )
