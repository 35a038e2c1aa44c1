"""Staircase exponential-decay schedules matching the reference trainers.

Reference: ShapeNet/ShapeNet_DGCNN_trainer.py:36-54 (identical in
S3DIS/S3DIS_DGCNN_trainer.py). Both schedules are driven by the number of
*samples* seen (``step * batch_size``), with staircase decay.
"""

from __future__ import annotations

import jax.numpy as jnp

from weaksuppointcloudseg_tpu.configs import ScheduleConfig


def learning_rate_schedule(step, batch_size: int, cfg: ScheduleConfig):
    """lr = max(base * rate^floor(step*bs/decay_step), 1e-5)."""
    samples = jnp.asarray(step, jnp.float32) * float(batch_size)
    exponent = jnp.floor(samples / float(cfg.lr_decay_step))
    lr = cfg.base_learning_rate * jnp.power(cfg.lr_decay_rate, exponent)
    return jnp.maximum(lr, cfg.lr_floor)


def bn_decay_schedule(step, batch_size: int, cfg: ScheduleConfig):
    """bn_decay = min(0.99, 1 - init*rate^floor(step*bs/bn_decay_step))."""
    samples = jnp.asarray(step, jnp.float32) * float(batch_size)
    exponent = jnp.floor(samples / float(cfg.bn_decay_decay_step))
    momentum = cfg.bn_init_decay * jnp.power(cfg.bn_decay_decay_rate, exponent)
    return jnp.minimum(cfg.bn_decay_clip, 1.0 - momentum)
