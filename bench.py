"""Training-throughput benchmark for the flagship ShapeNet Full config.

Measures sustained points/sec/chip of the complete Full-style training step
(EdgeConv DGCNN fwd+bwd, masked CE + Siamese + MIL + smooth losses, Adam,
BN-stat updates) at the reference's headline config: 2048 points, k=20,
batch 32 unique samples (= 64 Siamese-interleaved rows), the
`train_script:1-2` setting.

Baseline anchor (documented estimate, see BASELINE.md): the reference TF1
DGCNN pipeline on a V100 sustains roughly 1.8 steps/s at batch 32 x 2048 pts
= ~118k labelled points/s; the north-star target is >=5x that per TPU chip
(BASELINE.json). vs_baseline reported here is measured_points_per_sec /
118_000 — i.e. vs the *V100 reference estimate*, so hitting the north star
means vs_baseline >= 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import numpy as np

V100_REFERENCE_POINTS_PER_SEC = 118_000.0


def main() -> None:
    from weaksuppointcloudseg_tpu import configs
    from weaksuppointcloudseg_tpu.train.state import create_train_state
    from weaksuppointcloudseg_tpu.train.steps import make_train_step
    from weaksuppointcloudseg_tpu.utils.tools import onehot_encode

    cfg = configs.shapenet_config()
    unique_bs = 32
    cfg = dataclasses.replace(
        cfg,
        # bf16 compute (params/BN stats/logits stay fp32) is the recommended
        # fast config: loss matches f32 to 3 decimals, 272 vs 319 ms/step.
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
        train=dataclasses.replace(cfg.train, batch_size=unique_bs, style="Full"),
    )
    n = cfg.model.num_points
    b = 2 * unique_bs
    k = cfg.model.num_classes

    rng = np.random.default_rng(0)
    seg = rng.integers(0, k, (b, n))
    batch = {
        "data": rng.standard_normal((b, n, 3)).astype(np.float32),
        "seg": seg.astype(np.int32),
        "seg_onehot": onehot_encode(seg, k),
        "mask": (rng.uniform(size=(b, n)) < 0.1).astype(np.float32),
        "cat_onehot": onehot_encode(
            rng.integers(0, cfg.model.num_categories, (b,)), cfg.model.num_categories
        ),
        "valid": np.ones((b,), np.float32),
    }
    batch = jax.device_put(batch)

    state = create_train_state(jax.random.PRNGKey(0), cfg)
    train_step = make_train_step(cfg)
    gate = np.float32(1.0)
    key = jax.random.PRNGKey(1)

    # NOTE: on the axon-tunneled TPU, jax.block_until_ready returns before
    # device execution finishes; a scalar D2H fetch is the only reliable
    # barrier. Keys are pre-generated so the loop is pure dispatch.
    def sync(metrics) -> float:
        return float(metrics["total"])

    steps = 30
    keys = jax.random.split(key, steps + 1)

    # warmup (compile)
    state, metrics = train_step(state, batch, gate, keys[0])
    sync(metrics)

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = train_step(state, batch, gate, keys[i + 1])
    sync(metrics)
    dt = time.perf_counter() - t0

    points_per_sec = steps * unique_bs * n / dt
    print(json.dumps({
        "metric": "shapenet_full_train_throughput",
        "value": round(points_per_sec, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(points_per_sec / V100_REFERENCE_POINTS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
