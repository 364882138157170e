"""Shared top-k selection with the TPU fast path in ONE place.

On TPU-family backends, ``jax.lax.approx_max_k`` lowers to the PartialReduce
op: with ``recall_target=1.0`` it is EXACT and still beats the sort-based
``jax.lax.top_k`` on multi-megapixel inputs; lower recall targets trade
equal-score-tail exactness for another ~2x. Off TPU, ``approx_max_k`` has no
fast lowering, so both helpers fall back to the exact ``top_k``.

The platform check keys off the default backend's first device — the same
device every jitted computation in this package runs on unless the caller
overrides placement (a ``jax.default_device`` CPU override on a TPU host
would still take the TPU branch; both ops are correct there, just not the
fastest choice).
"""

from __future__ import annotations

import jax


def _tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:  # backend failed to initialize (e.g. dead tunnel)
        return False


def exact_top_k(x: jax.Array, k: int):
    """(values, indices) of the k largest — exact on every backend."""
    if _tpu_backend():
        return jax.lax.approx_max_k(x, k, recall_target=1.0)
    return jax.lax.top_k(x, k)


def approx_top_k(x: jax.Array, k: int, recall_target: float = 0.95):
    """Top-k where the caller tolerates swapping the weakest entries for
    near-equals (e.g. corner-feature selection) in exchange for ~10x over a
    full sort on TPU. Exact off TPU (no fast approximate lowering exists)."""
    if _tpu_backend():
        return jax.lax.approx_max_k(x, k, recall_target=recall_target)
    return jax.lax.top_k(x, k)
