"""Vectorized point-in-polygon tests (JAX).

Replaces the GEOS spatial join (gpd.sjoin predicate='within') used for lane
assignment (SURVEY.md §2.3 N15; reference assign_road_section_lane,
georeference.py:458-479). Lanes are 4-corner polygons built from the
segmentation CSV, so the test is N points x M quads — a ray-casting
crossing-number test broadcast over both axes, one fused elementwise block.
"""

from __future__ import annotations

import jax.numpy as jnp


def points_in_polygons(points: jnp.ndarray, polygons: jnp.ndarray,
                       eps: float = 1e-12) -> jnp.ndarray:
    """(N,2) points x (M,K,2) closed polygons -> (N,M) bool containment.

    Crossing-number (even-odd) test with a horizontal ray to +x. Matches
    shapely 'within' for interior points; boundary points are
    implementation-defined in both (sub-pixel lane edges are noise-level).
    """
    px = points[:, None, None, 0]
    py = points[:, None, None, 1]
    x1 = polygons[None, :, :, 0]
    y1 = polygons[None, :, :, 1]
    x2 = jnp.roll(polygons[..., 0], -1, axis=-1)[None, :, :]
    y2 = jnp.roll(polygons[..., 1], -1, axis=-1)[None, :, :]

    straddles = (y1 > py) != (y2 > py)
    x_at_y = x1 + (py - y1) * (x2 - x1) / jnp.where(
        jnp.abs(y2 - y1) < eps, eps, y2 - y1
    )
    crossings = jnp.sum(straddles & (px < x_at_y), axis=-1)
    return (crossings % 2) == 1


def assign_first_polygon(points: jnp.ndarray, polygons: jnp.ndarray) -> jnp.ndarray:
    """(N,) index of the first polygon containing each point, -1 when none.

    'First' follows polygon order, matching the single-match semantics of the
    reference's sjoin-then-first-match lane assignment.
    """
    inside = points_in_polygons(points, polygons)  # (N,M)
    first = jnp.argmax(inside, axis=1)
    any_hit = jnp.any(inside, axis=1)
    return jnp.where(any_hit, first, -1)
