"""Learned ReID head hook (VERDICT r2 #9).

cfg ``tracker.<name>.model: <path>.npz`` loads a small conv embedding head
(track/reid.py) replacing the default fixed-projection appearance signature;
``auto``/missing files keep the projection (reference cfg/default.yaml:377-379
``model: auto`` semantics).
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geotrax_tpu.track import reid


def test_init_save_load_roundtrip(tmp_path):
    params = reid.init_head(jax.random.PRNGKey(0), emb_dim=64)
    path = tmp_path / "head.npz"
    reid.save_head(path, params)
    loaded = reid.load_head(path)
    assert loaded is not None
    for k, v in params.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(loaded[k]))


def test_load_missing_or_malformed_returns_none(tmp_path):
    assert reid.load_head(tmp_path / "nope.npz") is None
    bad = tmp_path / "bad.npz"
    np.savez(bad, conv0_w=np.zeros((3, 3, 3, 16)))  # missing the rest
    assert reid.load_head(bad) is None


def test_embed_patches_shapes_and_norm():
    params = reid.init_head(jax.random.PRNGKey(1), emb_dim=32)
    patches = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (5, 32, 32, 3)).astype(np.float32)
    )
    emb = reid.embed_patches(params, patches)
    assert emb.shape == (5, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5
    )


def test_resolve_head(tmp_path, caplog):
    logger = logging.getLogger("gtx-test-reid")
    # auto / None / absent -> projection path
    assert reid.resolve_head({"model": "auto"}, logger) is None
    assert reid.resolve_head({}, logger) is None
    assert reid.resolve_head(None, logger) is None
    # non-npz reference -> warning + projection path
    with caplog.at_level(logging.WARNING, logger.name):
        assert reid.resolve_head({"model": "osnet_x0_25.pt"}, logger) is None
    assert "only .npz" in caplog.text
    # real checkpoint loads
    path = tmp_path / "head.npz"
    reid.save_head(path, reid.init_head(jax.random.PRNGKey(0)))
    params = reid.resolve_head({"model": str(path)}, logger)
    assert params is not None and "proj_w" in params


def test_head_swaps_embeddings_in_embed_boxes():
    """Supplying head_params must change the produced embeddings (the learned
    head replaces the projection), while both stay L2-normalized."""
    from geotrax_tpu.pipeline.device_pipeline import embed_boxes

    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(0, 255, (1, 128, 160, 3), np.uint8))
    boxes = jnp.asarray([[[40.0, 48.0, 24, 24], [90.0, 48.0, 24, 24]]])
    proj = embed_boxes(frames, boxes)
    head = embed_boxes(
        frames, boxes, head_params=reid.init_head(jax.random.PRNGKey(7))
    )
    assert proj.shape == head.shape
    np.testing.assert_allclose(np.linalg.norm(np.asarray(head), axis=-1), 1.0, atol=1e-4)
    assert np.abs(np.asarray(proj) - np.asarray(head)).max() > 1e-3


def test_head_changes_association_cost():
    """Two visually distinct targets: the appearance-distance ORDERING that
    drives ReID association must hold for the learned head exactly as for the
    projection — same-appearance pairs closer than cross-appearance — and
    swapping the head must change the actual cost values used."""
    from geotrax_tpu.pipeline.device_pipeline import embed_boxes

    rng = np.random.default_rng(11)
    frame = np.zeros((128, 192, 3), np.uint8)
    # target A: checkerboard texture; target B: smooth gradient
    tex = (np.indices((32, 32)).sum(axis=0) % 2 * 255).astype(np.uint8)
    frame[32:96, 16:80] = 128
    frame[48:80, 32:64] = tex[..., None]
    grad = np.linspace(0, 255, 32, dtype=np.uint8)
    frame[48:80, 112:144] = grad[None, :, None]
    frames = jnp.asarray(frame)[None]
    # boxes are full-res cxcywh; embed pools 0.5x so centers at (48,64)/(128,64)
    boxes = jnp.asarray([[[96.0, 128.0, 64, 64], [256.0, 128.0, 64, 64]]])

    for head in (None, reid.init_head(jax.random.PRNGKey(5))):
        e = np.asarray(embed_boxes(frames, boxes, head_params=head))[0]
        same = e[0] @ e[0]
        cross = e[0] @ e[1]
        assert same == pytest.approx(1.0, abs=1e-4)
        assert cross < 0.999  # distinct appearance separates
