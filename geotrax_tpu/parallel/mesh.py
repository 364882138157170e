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
    """Device-put a batch pytree sharded over the 'data' axis (dim 0)."""
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), batch
    )


def make_train_step(spec, tx, mesh: Mesh):
    """Build a jitted, mesh-sharded full training step:
    loss -> grads -> optimizer update, with params tensor-parallel and the
    batch data-parallel. Returns step(params, opt_state, batch) ->
    (params, opt_state, metrics)."""
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
                a, NamedSharding(mesh, P("data"))
            ),
            batch,
        )

        def loss_fn(p):
            return detection_loss(
                p, batch["images"], batch["gt_boxes"], batch["gt_cls"],
                batch["gt_mask"], spec,
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
            frames, NamedSharding(mesh, P("data"))
        )
        boxes, probs = yolov8.forward(params, frames, spec)
        return jax.vmap(
            lambda b, p: postprocess_detections(b, p, conf, iou, max_det)
        )(boxes, probs)

    return run
