"""Scale-out layer on the virtual 8-device CPU mesh: mesh construction,
sharded training step, multi-video batch tracking equivalence, and the
on-device aggregation arithmetic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geotrax_tpu.parallel import make_mesh, shard_batch, shard_params
from geotrax_tpu.parallel.video_batch import (
    VideoBatchTracker,
    aggregate_track_counts,
    offset_vehicle_ids,
)
from geotrax_tpu.track.base import TrackerConfig, init_state, byte_step


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(8, dp=8, tp=1)
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(AssertionError):
        make_mesh(8, dp=3, tp=2)


@pytest.mark.slow
def test_shard_params_tensor_parallel():
    from geotrax_tpu.models import yolov8

    mesh = make_mesh(8)
    spec = yolov8.ModelSpec(variant="n", nc=4)
    params = yolov8.init_params(jax.random.PRNGKey(0), spec)
    sharded = shard_params(params, mesh)
    # a wide conv kernel must actually be sharded over 'model'
    w = sharded["layers"]["7"]["w"]  # (3,3,C,128) for variant n
    spec_found = w.sharding.spec
    assert spec_found[-1] == "model"
    np.testing.assert_allclose(np.asarray(w), np.asarray(params["layers"]["7"]["w"]))


@pytest.mark.slow
def test_sharded_train_step_runs():
    import optax

    from geotrax_tpu.models import yolov8
    from geotrax_tpu.parallel import make_train_step

    mesh = make_mesh(8)
    spec = yolov8.ModelSpec(variant="n", nc=2)
    params = yolov8.init_params(jax.random.PRNGKey(0), spec)
    tx = optax.sgd(1e-3)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)), jnp.float32),
        "gt_boxes": jnp.asarray(rng.uniform(10, 50, (8, 4, 4)), jnp.float32),
        "gt_cls": jnp.zeros((8, 4), jnp.int32),
        "gt_mask": jnp.ones((8, 4), bool),
    }
    with mesh:
        params = shard_params(params, mesh)
        opt_state = tx.init(params)
        batch = shard_batch(batch, mesh)
        step = make_train_step(spec, tx, mesh)
        new_params, _, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------- video batch
def make_dets(rng, n_videos, n_frames, max_det=8):
    boxes = np.zeros((n_videos, n_frames, max_det, 4), np.float32)
    scores = np.zeros((n_videos, n_frames, max_det), np.float32)
    classes = np.full((n_videos, n_frames, max_det), -1, np.int32)
    valid = np.zeros((n_videos, n_frames, max_det), bool)
    for v in range(n_videos):
        x0 = 40.0 + 30 * v
        for t in range(n_frames):
            boxes[v, t, 0] = [x0 + 3 * t, 60, 24, 12]
            scores[v, t, 0] = 0.9
            classes[v, t, 0] = 0
            valid[v, t, 0] = True
    return tuple(map(jnp.asarray, (boxes, scores, classes, valid)))


@pytest.mark.slow
def test_video_batch_matches_sequential():
    """V videos advanced by the vmapped batch tracker produce exactly the
    per-video results of running each tracker alone."""
    cfg = TrackerConfig(max_tracks=16)
    n_videos, n_frames = 4, 10
    rng = np.random.default_rng(0)
    boxes, scores, classes, valid = make_dets(rng, n_videos, n_frames)

    batch = VideoBatchTracker(cfg, n_videos)
    out = batch.step_chunk(boxes, scores, classes, valid, 1)

    for v in range(n_videos):
        state = init_state(cfg)
        for t in range(n_frames):
            state, single = byte_step(
                state, boxes[v, t], scores[v, t], classes[v, t], valid[v, t],
                t + 1, cfg, None,
            )
            np.testing.assert_array_equal(
                np.asarray(out.valid[v, t]), np.asarray(single.valid)
            )
            np.testing.assert_allclose(
                np.asarray(out.box_xywh[v, t]), np.asarray(single.box_xywh), atol=1e-4
            )


def test_video_batch_on_mesh():
    cfg = TrackerConfig(max_tracks=16)
    mesh = make_mesh(8, dp=8, tp=1)
    rng = np.random.default_rng(1)
    boxes, scores, classes, valid = make_dets(rng, 8, 6)
    with mesh:
        batch = VideoBatchTracker(cfg, 8, mesh=mesh)
        data = jax.tree.map(
            lambda a: jax.device_put(
                a, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
            ),
            (boxes, scores, classes, valid),
        )
        out = batch.step_chunk(*data, 1)
    # each of the 8 videos tracked its object through all 6 frames
    assert np.asarray(out.valid).sum() == 8 * 6


def test_offset_vehicle_ids_prefix_sum():
    max_ids = jnp.asarray([5, 3, 0, 7])
    offsets = np.asarray(offset_vehicle_ids(max_ids))
    np.testing.assert_array_equal(offsets, [0, 5, 8, 8])


def test_aggregate_track_counts():
    ids = jnp.asarray([[[1, 2, 0], [3, 0, 0]], [[9, 0, 0], [0, 0, 0]]])
    valid = ids > 0
    max_ids, rows = aggregate_track_counts(ids, valid, num_segments=2)
    np.testing.assert_array_equal(np.asarray(max_ids), [3, 9])
    np.testing.assert_array_equal(np.asarray(rows), [3, 1])


def test_hybrid_multislice_mesh_train_step():
    """Multi-slice pod recipe (parallel/mesh.py make_hybrid_mesh): the
    ('slice','data','model') hybrid mesh — data parallelism across the DCN
    'slice' axis, tensor parallelism on in-slice ICI — runs the SAME train
    step and produces the same loss as the flat single-slice mesh (GSPMD
    resharding only; closes SURVEY §2.6's multi-slice/DCN gap)."""
    import optax

    from geotrax_tpu.parallel import make_hybrid_mesh, make_train_step

    hybrid = make_hybrid_mesh(2, 8)  # 2 slices x (2 data x 2 model)
    assert dict(hybrid.shape) == {"slice": 2, "data": 2, "model": 2}
    flat = make_mesh(8)

    from geotrax_tpu.models import yolov8

    spec = yolov8.ModelSpec(variant="n", nc=2)
    tx = optax.sgd(1e-3)
    rng = np.random.default_rng(0)
    batch_np = {
        "images": np.asarray(rng.uniform(0, 1, (8, 64, 64, 3)), np.float32),
        "gt_boxes": np.asarray(rng.uniform(10, 50, (8, 4, 4)), np.float32),
        "gt_cls": np.zeros((8, 4), np.int32),
        "gt_mask": np.ones((8, 4), bool),
    }

    losses = {}
    for name, mesh in (("flat", flat), ("hybrid", hybrid)):
        with mesh:
            # fresh init per mesh: the train step donates params/opt_state
            params = shard_params(
                yolov8.init_params(jax.random.PRNGKey(0), spec), mesh
            )
            opt_state = tx.init(params)
            batch = shard_batch(
                {k: jnp.asarray(v) for k, v in batch_np.items()}, mesh
            )
            step = make_train_step(spec, tx, mesh)
            new_params, _, metrics = step(params, opt_state, batch)
            losses[name] = float(metrics["loss"])
            # batch really shards over both data axes on the hybrid mesh
            if name == "hybrid":
                spec_b = batch["images"].sharding.spec
                assert tuple(spec_b)[0] == ("slice", "data")
    assert np.isfinite(losses["flat"]) and np.isfinite(losses["hybrid"])
    np.testing.assert_allclose(losses["hybrid"], losses["flat"], rtol=2e-5)


def test_hybrid_mesh_rejects_bad_split():
    from geotrax_tpu.parallel import make_hybrid_mesh

    with pytest.raises(ValueError):
        make_hybrid_mesh(3, 8)
