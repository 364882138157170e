"""Linear assignment for tracker association.

Replaces the lapx (LAPJV) solver used inside the ultralytics trackers
(SURVEY.md §2.3 N5). Two backends behind one gated interface:

- **auction** (default, on-device): a single-phase Jacobi forward auction from
  zero prices. Key design point: the cost matrix is padded with a *private*
  dummy column per row (diagonal = unmatched cost, off-diagonal = gated), so
  rows never compete for dummies — on gated tracking matrices this converges
  in <~10 vectorized rounds and its assignments match the exact optimum
  (validated vs scipy in tests); the theoretical bound is N*eps suboptimality.
  Fully jittable: fixed shapes, lax.while_loop with early exit.

- **lapjv** (exact, host): first-party C++ Jonker-Volgenant solver
  (geotrax_tpu/io/native/lapjv.cpp) reached via ctypes, with a scipy
  fallback. Used by offline tools and as the parity oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_iters",))
def auction_assignment(cost: jnp.ndarray, eps: float = 2e-4, max_iters: int = 512) -> jnp.ndarray:
    """Min-cost assignment of (N,M) cost rows to distinct columns, N <= M.

    Single-phase forward auction (Jacobi rounds: every unassigned row bids at
    once) from zero prices; optimal within N*eps. Returns (N,) column per
    row; rows still unassigned at the iteration cap return -1 (does not
    happen on gated tracking matrices — see module docstring).
    """
    n, m = cost.shape
    benefit = -cost
    rows = jnp.arange(n)
    cols = jnp.arange(m)

    def cond(state):
        _, _, assigned, it = state
        return jnp.logical_and(it < max_iters, jnp.any(assigned < 0))

    def body(state):
        prices, owner, assigned, it = state
        unassigned = assigned < 0
        values = benefit - prices[None, :]
        best_col = jnp.argmax(values, axis=1).astype(jnp.int32)
        best_val = jnp.max(values, axis=1)
        second_val = jnp.max(values.at[rows, best_col].set(-jnp.inf), axis=1)
        second_val = jnp.where(jnp.isfinite(second_val), second_val, best_val - 1.0)
        bid = jnp.where(unassigned, best_val - second_val + eps, -jnp.inf)

        bid_matrix = jnp.where(best_col[:, None] == cols[None, :], bid[:, None], -jnp.inf)
        win_bid = jnp.max(bid_matrix, axis=0)
        win_row = jnp.argmax(bid_matrix, axis=0).astype(jnp.int32)
        col_has_bid = jnp.isfinite(win_bid)

        displaced = jnp.where(col_has_bid & (owner >= 0), owner, n)
        lost = jnp.zeros((n,), dtype=bool).at[displaced].set(True, mode="drop")
        assigned = jnp.where(lost, -1, assigned)

        owner = jnp.where(col_has_bid, win_row, owner)
        prices = prices + jnp.where(col_has_bid, win_bid, 0.0)
        winner_rows = jnp.where(col_has_bid, win_row, n)
        assigned = assigned.at[winner_rows].set(cols.astype(jnp.int32), mode="drop")
        return prices, owner, assigned, it + 1

    init = (
        jnp.zeros((m,), dtype=cost.dtype),
        jnp.full((m,), -1, dtype=jnp.int32),
        jnp.full((n,), -1, dtype=jnp.int32),
        0,
    )
    _, _, assigned, _ = jax.lax.while_loop(cond, body, init)
    return assigned


def masked_assignment(
    cost: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
    threshold: float,
    eps: float = 2e-4,
    max_iters: int = 512,
):
    """Gated rectangular assignment (the tracker-association primitive).

    cost: (N,M); invalid rows/columns and pairs with cost > ``threshold`` may
    not match. Returns (row_to_col (N,), matched (N,)); unmatched rows get -1.

    Padding layout (the thing that makes the auction fast *and* exact here):
    each row gets a private dummy column at cost ``threshold + delta`` while
    every other dummy is at the gated level ``threshold + 2*delta`` — an
    unmatched row takes its own dummy without contention.
    """
    n, m = cost.shape
    delta = 0.05 * max(float(threshold), 1.0)
    gated_cost = threshold + 2.0 * delta
    gated = jnp.where(
        row_valid[:, None] & col_valid[None, :] & (cost <= threshold), cost, gated_cost
    )
    dummies = jnp.where(jnp.eye(n, dtype=bool), threshold + delta, gated_cost)
    padded = jnp.concatenate([gated, dummies.astype(gated.dtype)], axis=1)
    col = auction_assignment(padded, eps=eps, max_iters=max_iters)
    pair_cost = padded[jnp.arange(n), jnp.clip(col, 0, m + n - 1)]
    matched = (col >= 0) & (col < m) & row_valid & (pair_cost <= threshold)
    return jnp.where(matched, col, -1), matched


# ---------------------------------------------------------------------------
# Exact host solver (native C++ LAPJV, scipy fallback)
# ---------------------------------------------------------------------------

def lapjv_exact(cost: np.ndarray) -> np.ndarray:
    """Exact min-cost assignment (N<=M) on the host; returns (N,) columns.

    Prefers the first-party C++ Jonker-Volgenant solver; falls back to
    scipy.optimize.linear_sum_assignment.
    """
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    try:
        from geotrax_tpu.io.native import lapjv_native

        out = lapjv_native(cost)
        if out is not None:
            return out
    except Exception:  # noqa: BLE001 — any native issue falls through to scipy
        pass
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(cost)
    result = np.full(n, -1, dtype=np.int64)
    result[rows] = cols
    return result
