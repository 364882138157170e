"""RT-DETR-class detector: shapes, query selection, refinement, loss +
gradient flow with auction-based bipartite matching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geotrax_tpu.models import rtdetr

SPEC = rtdetr.RTDETRSpec(variant="n", nc=4, hidden=64, num_queries=30,
                         num_decoder_layers=2, num_heads=4, num_points=2)


@pytest.fixture(scope="module")
def params():
    return rtdetr.init_params(jax.random.PRNGKey(0), SPEC)


def test_forward_shapes(params):
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    boxes, probs = rtdetr.forward(params, x, SPEC)
    assert boxes.shape == (1, SPEC.num_queries, 4)
    assert probs.shape == (1, SPEC.num_queries, 4)
    b = np.asarray(boxes)
    assert (b >= -96).all() and (b <= 2 * 96).all()  # sane pixel range
    p = np.asarray(probs)
    assert (p >= 0).all() and (p <= 1).all()


@pytest.mark.slow
def test_forward_batched(params):
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 96, 96, 3)), jnp.float32)
    boxes, probs = rtdetr.forward(params, x, SPEC)
    assert boxes.shape[0] == 2
    # different images -> different outputs
    assert not np.allclose(np.asarray(boxes[0]), np.asarray(boxes[1]))


@pytest.mark.slow
def test_loss_finite_and_differentiable(params):
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 3)), jnp.float32)
    gt_boxes = jnp.asarray(rng.uniform(20, 70, (2, 5, 4)), jnp.float32)
    gt_cls = jnp.asarray(rng.integers(0, 4, (2, 5)), jnp.int32)
    gt_mask = jnp.asarray([[True] * 3 + [False] * 2, [True] * 5])

    (loss, metrics), grads = jax.value_and_grad(
        lambda p: rtdetr.detr_loss(p, images, gt_boxes, gt_cls, gt_mask, SPEC),
        has_aux=True,
    )(params)
    assert np.isfinite(float(loss))
    # gradients reach both the decoder and the backbone
    g_dec = np.abs(np.asarray(grads["layers"][0]["cross"]["offsets"]["w"])).max()
    g_bb = np.abs(np.asarray(grads["backbone"]["0"]["w"])).max()
    assert g_dec > 0
    assert g_bb > 0


@pytest.mark.slow
def test_short_optimization_decreases_loss(params):
    import optax

    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.uniform(0, 1, (1, 96, 96, 3)), jnp.float32)
    gt_boxes = jnp.asarray([[[30.0, 30, 20, 12], [70, 60, 18, 10]]], jnp.float32)
    gt_cls = jnp.zeros((1, 2), jnp.int32)
    gt_mask = jnp.ones((1, 2), bool)

    tx = optax.adam(1e-3)
    p = params
    opt_state = tx.init(p)

    @jax.jit
    def step(p, opt_state):
        (loss, _), grads = jax.value_and_grad(
            lambda pp: rtdetr.detr_loss(pp, images, gt_boxes, gt_cls, gt_mask, SPEC),
            has_aux=True,
        )(p)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss

    losses = []
    for _ in range(8):
        p, opt_state, loss = step(p, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"no improvement: {losses}"


def test_detector_rtdetr_dispatch(tmp_path, params):
    """The Detector runtime dispatches on 'rtdetr' in the model name and
    serves NMS-free fixed-slot detections from a native .npz."""
    from geotrax_tpu.models.convert import save_npz
    from geotrax_tpu.models.detector import Detector

    path = tmp_path / "rtdetr_n.npz"
    save_npz(path, params, class_names={0: "car"}, variant="n", nc=4,
             hidden=SPEC.hidden, num_queries=SPEC.num_queries,
             num_decoder_layers=SPEC.num_decoder_layers,
             num_heads=SPEC.num_heads, num_points=SPEC.num_points)
    det = Detector(path, {"imgsz": 96, "conf": 0.0, "max_det": 50})
    assert det.is_rtdetr
    frame = np.random.default_rng(0).integers(0, 255, (80, 120, 3), np.uint8)
    out = det(frame)
    assert out["boxes_xywh"].shape == (50, 4)
    assert out["scores"].shape == (50,)
    assert bool(out["valid"].any())  # conf 0: every query slot valid
