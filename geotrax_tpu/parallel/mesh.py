"""Mesh construction and sharded train/inference steps (dp x tp).

Design (scaling-book recipe): pick a mesh, annotate shardings on params and
batch, let XLA/GSPMD insert the collectives.

- data axis: batches of frames (inference) or images (training) — pure DP,
  gradient psum over 'data'.
- model axis: conv output channels (HWIO dim 3) — tensor parallelism for
  the wide backbone layers; channels not divisible by the axis size stay
  replicated. GSPMD inserts the halo/all-gather traffic on ICI.

All entry points degrade gracefully to a single device (mesh of 1).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None) -> Mesh:
    """('data', 'model') mesh over the first n_devices. Defaults: all
    devices, tp=2 when even and >1 else tp=1."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    return Mesh(devices.reshape(dp, tp), axis_names=("data", "model"))


DATA_AXES = ("slice", "data")  # batch dim 0 shards over both data axes


def make_hybrid_mesh(n_slices: int, n_devices: Optional[int] = None,
                     tp: Optional[int] = None) -> Mesh:
    """('slice', 'data', 'model') mesh for multi-slice pods: the outer
    'slice' axis crosses the DCN (inter-slice network), the inner axes stay
    on ICI. The parallelism recipe keeps DCN traffic gradient-sized: tensor
    parallelism ('model') never crosses slices, per-step activations shard
    over in-slice 'data', and only the gradient psum reduces over 'slice'
    (the scaling-book multi-pod recipe; reference scales via SLURM
    one-process-per-GPU instead, train/README).

    On real multi-slice TPU hardware the device grid comes from
    mesh_utils.create_hybrid_device_mesh (DCN-aware placement); on a flat
    device list (CPU tests, single slice) a plain reshape gives the same
    logical topology."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % n_slices:
        raise ValueError(f"{n} devices do not split into {n_slices} slices")
    per_slice = n // n_slices
    if tp is None:
        tp = 2 if per_slice % 2 == 0 and per_slice > 1 else 1
    dp = per_slice // tp
    assert dp * tp == per_slice, f"dp({dp}) * tp({tp}) != per-slice({per_slice})"
    shape = (n_slices, dp, tp)
    if n_slices > 1 and getattr(devices[0], "slice_index", None) is not None:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (1, dp, tp), (n_slices, 1, 1), devices=devices[:n]
        )
    else:
        grid = np.asarray(devices[:n]).reshape(shape)
    return Mesh(grid, axis_names=("slice", "data", "model"))


def batch_spec(mesh: Mesh) -> P:
    """Batch-dim partition spec: over ('slice','data') on a hybrid mesh,
    'data' otherwise."""
    if "slice" in mesh.axis_names:
        return P(DATA_AXES)
    return P("data")


def _param_spec(path_leaf, mesh: Mesh) -> P:
    """Partition spec for one parameter array: conv kernels (HWIO) shard O
    over 'model' when divisible; biases shard over 'model' when divisible;
    everything else replicates."""
    arr = path_leaf
    tp = mesh.shape["model"]
    if tp == 1:
        return P()
    if arr.ndim == 4 and arr.shape[3] % tp == 0:
        return P(None, None, None, "model")
    if arr.ndim == 1 and arr.shape[0] % tp == 0 and arr.shape[0] >= tp * 8:
        return P("model")
    return P()


def shard_params(params, mesh: Mesh):
    """Device-put the parameter pytree with tensor-parallel shardings."""
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, _param_spec(a, mesh))), params
    )


def shard_batch(batch, mesh: Mesh):
    """Device-put a batch pytree sharded over the data axis/axes (dim 0)."""
    spec = batch_spec(mesh)
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, spec)), batch
    )


def make_train_step(spec, tx, mesh: Mesh, box_gain: float = 7.5,
                    cls_gain: float = 0.5, dfl_gain: float = 1.5):
    """Build a jitted, mesh-sharded full training step:
    loss -> grads -> optimizer update, with params tensor-parallel and the
    batch data-parallel. Returns step(params, opt_state, batch) ->
    (params, opt_state, metrics). The gain knobs mirror cfg ultralytics
    box/cls/dfl so train.py can use THIS step (one implementation, not an
    inline divergent copy)."""
    from geotrax_tpu.models.loss import detection_loss

    def constrain(params):
        return jax.tree.map(
            lambda p: jax.lax.with_sharding_constraint(
                p, NamedSharding(mesh, _param_spec(p, mesh))
            ),
            params,
        )

    def step(params, opt_state, batch):
        params = constrain(params)
        batch = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, batch_spec(mesh))
            ),
            batch,
        )

        def loss_fn(p):
            return detection_loss(
                p, batch["images"], batch["gt_boxes"], batch["gt_cls"],
                batch["gt_mask"], spec, box_gain, cls_gain, dfl_gain,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return constrain(params), opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))


def make_inference_step(spec, mesh: Mesh, conf: float = 0.25, iou: float = 0.7,
                        max_det: int = 300):
    """Sharded batched detection: (B,H,W,3) frames data-parallel over the
    mesh -> per-frame fixed-slot detections."""
    from geotrax_tpu.models import yolov8
    from geotrax_tpu.ops.nms import postprocess_detections

    @jax.jit
    def run(params, frames):
        frames = jax.lax.with_sharding_constraint(
            frames, NamedSharding(mesh, batch_spec(mesh))
        )
        boxes, probs = yolov8.forward(params, frames, spec)
        return jax.vmap(
            lambda b, p: postprocess_detections(b, p, conf, iou, max_det)
        )(boxes, probs)

    return run
