"""Multi-host data parallelism: 2 processes x 4 CPU devices == 1 process
x 8 devices (SURVEY.md §2.3 / §5 distributed-communication-backend row).

The subprocesses bring up jax.distributed on localhost (Gloo collectives),
build the global 8-device mesh, feed per-process batch shards via
jax.make_array_from_process_local_data, and run one Full-style train step;
process 0 writes the loss. The in-process reference runs the same step on
this test session's own 8-device CPU mesh with the full batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_matches_single_process(tmp_path):
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    # --- reference: single process, 8 local devices, full batch ---
    from weaksuppointcloudseg_tpu.parallel import mesh as pmesh
    from weaksuppointcloudseg_tpu.parallel.multihost import (
        _tiny_config,
        run_one_step,
    )

    cfg = _tiny_config()
    mesh = pmesh.make_mesh(8)
    ref_loss, ref_acc = run_one_step(mesh, cfg, process_local=False)

    # --- 2 subprocesses x 4 devices each ---
    port = _free_port()
    out_file = str(tmp_path / "mp.json")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "weaksuppointcloudseg_tpu.parallel.multihost",
             str(pid), "2", str(port), "4", out_file],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    got = json.load(open(out_file))
    assert got["processes"] == 2 and got["devices"] == 8
    # same global batch, same init, same 8-way sharding -> same step; only
    # reduction scheduling differs between the two topologies
    np.testing.assert_allclose(got["loss"], ref_loss, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["acc"], ref_acc, rtol=1e-5, atol=1e-6)
