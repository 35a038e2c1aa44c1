"""Alternate / experimental inexact-supervision losses.

Rebuild of Util/Loss.py — imported but never called by the reference
trainers (SURVEY.md C17). Provided (and actually tested) for completeness:

- ``focal_loss`` (Util/Loss.py:5-35): multi-label sigmoid focal loss,
  per-entry (the ``alpha``-broadcast v1 at :38-72 is the same formula with a
  tensor alpha — covered by accepting scalar or array alpha here).
- ``class_weighted_ce`` (:75-87): sigmoid CE with per-class pos/neg weights.
- ``self_entropy`` (:89-98): +sum(p log p) per point (NOTE: the reference
  returns the *negative* entropy — minimizing it maximizes uncertainty;
  kept verbatim, see docstring).
- ``overwhelm_loss`` (:167-195) and variants v1 (:100-131) / v2 (:134-164):
  hinge penalties pushing some point's logit for each present class above
  the other classes. v2's Python class loop is replaced by one vectorized
  masked-max formulation.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array


def focal_loss(logits: Array, targets: Array, *,
               alpha: Union[float, Array] = 0.25, gamma: float = 2.0) -> Array:
    """Per-entry multi-label sigmoid focal loss (Util/Loss.py:5-35)."""
    p = jax.nn.sigmoid(logits)
    pos = jnp.where(targets > 0, targets - p, 0.0)
    neg = jnp.where(targets > 0, 0.0, p)
    log_p = jnp.log(jnp.clip(p, 1e-8, 1.0))
    log_1p = jnp.log(jnp.clip(1.0 - p, 1e-8, 1.0))
    return -alpha * pos**gamma * log_p - (1.0 - alpha) * neg**gamma * log_1p


def class_weighted_ce(logits: Array, targets: Array,
                      pos_weight: Array, neg_weight: Array) -> Array:
    """Per-entry class-weighted sigmoid CE (Util/Loss.py:75-87)."""
    p = jax.nn.sigmoid(logits)
    return -(pos_weight * targets * jnp.log(jnp.clip(p, 1e-8, 1.0))
             + neg_weight * (1.0 - targets) * jnp.log(jnp.clip(1.0 - p, 1e-8, 1.0)))


def self_entropy(logits: Array) -> Array:
    """[B, N] per-point sum(p log p) — i.e. *negative* entropy, exactly as
    the reference computes it (Util/Loss.py:89-98). To penalize uncertainty
    the caller should minimize ``-self_entropy`` (the reference never calls
    it, so its sign convention is preserved verbatim)."""
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(p * jnp.log(p + 1e-5), axis=-1)


def overwhelm_loss(logits: Array, bag_labels: Array) -> Tuple[Array, Array]:
    """Hinge: for each present class, some point's logit should top all
    classes (Util/Loss.py:167-195). Returns (scalar, per-class [B, K])."""
    max_j = jnp.max(logits, axis=-1, keepdims=True)  # B*N*1
    min_gap = jnp.min(max_j - logits, axis=1)  # B*K
    per_class = bag_labels * jnp.maximum(min_gap, 0.0)
    return jnp.mean(jnp.sum(per_class, axis=-1)), per_class


def overwhelm_loss_v1(logits: Array, bag_labels: Array) -> Array:
    """Pairwise variant: max logit of present class j1 should exceed the min
    logit of present class j2 (Util/Loss.py:100-131)."""
    l_max = jnp.max(logits, axis=1)[..., :, None]  # B*K*1
    l_min = jnp.min(logits, axis=1)[..., None, :]  # B*1*K
    penalty = jnp.maximum(l_min - l_max, 0.0)  # B*K*K
    # mask[j, l] = Y_j * Y_l with the diagonal zeroed (Y binary:
    # Y_j^2 - Y_j = 0), matching tf.einsum(...) - tf.matrix_diag(Y)
    k = bag_labels.shape[-1]
    mask = (bag_labels[..., :, None] * bag_labels[..., None, :]
            - bag_labels[..., None] * jnp.eye(k))
    return jnp.mean(jnp.mean(penalty * mask, axis=(-1, -2)))


def overwhelm_loss_v2(logits: Array, bag_labels: Array):
    """Per-class vectorized variant of Util/Loss.py:134-164: for present
    classes, some point's class-k logit should beat the max over the other
    classes; for absent classes, no point's class-k logit may.

    Returns (scalar, pos_part [B, K], neg_part [B, K])."""
    b, n, k = logits.shape
    # max over classes excluding k, for every k: mask the k-th column out
    eye = jnp.eye(k, dtype=bool)
    # [B, N, K(k), K(j)]: logits broadcast over target class k with j == k
    # masked to -inf, then max over j
    masked = jnp.where(eye[None, None, :, :], -jnp.inf,
                       logits[:, :, None, :])
    max_excl = jnp.max(masked, axis=-1)  # [B, N, K]
    gap = max_excl - logits  # [B, N, K]
    pos = bag_labels * jnp.maximum(jnp.min(gap, axis=1), 0.0)  # B*K
    neg = (1.0 - bag_labels) * jnp.maximum(jnp.max(-gap, axis=1), 0.0)  # B*K
    return jnp.mean(pos + neg), pos, neg
