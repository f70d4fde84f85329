"""Hard-negative mining as a masked, static-shape on-device op.

Behavior spec: SURVEY.md §2.2 "Hard-negative mining" (SSD §2.2): sort negative
anchors by confidence loss descending, keep at most `neg_pos_ratio` × num_pos.

TPU-native design: instead of a data-dependent sort-and-slice (dynamic
shapes), compute each negative's *rank* by loss and keep rank < 3·N_pos —
a pure masked comparison, fully jittable and batch-parallel
(SURVEY.md §2.2 "mask-based top-k instead of sort-by-loss").
"""

from __future__ import annotations

import jax.numpy as jnp


def hard_negative_mask(
    conf_loss: jnp.ndarray,
    positive: jnp.ndarray,
    neg_pos_ratio: float = 3.0,
    min_negatives: int = 0,
) -> jnp.ndarray:
    """Select hard negatives per image.

    Args:
      conf_loss: (..., num_anchors) per-anchor classification loss.
      positive: (..., num_anchors) bool positive-anchor mask.
      neg_pos_ratio: keep at most ratio × num_pos negatives (reference: 3:1).
      min_negatives: floor on kept negatives (useful for images with 0 GTs).

    Returns bool mask (..., num_anchors): chosen negatives (disjoint from
    positives by construction).
    """
    neg_loss = jnp.where(positive, -jnp.inf, conf_loss)
    # rank[i] = number of negatives with strictly larger loss. argsort-of-
    # argsort gives a dense rank; two argsorts lower to on-device sorts with
    # static shapes (fine on TPU: num_anchors is a compile-time constant).
    order = jnp.argsort(-neg_loss, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    num_pos = jnp.sum(positive, axis=-1, keepdims=True)
    max_neg = jnp.maximum(
        (neg_pos_ratio * num_pos).astype(jnp.int32), min_negatives
    )
    # Also never exceed the actual number of negatives (vacuous given ranks of
    # positives sort last, but keeps the mask exact when everything matches).
    return (ranks < max_neg) & ~positive & jnp.isfinite(neg_loss)
