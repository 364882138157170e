"""Scale-out: device meshes, sharded inference/training, on-device aggregation.

The reference scales by running the pipeline per video and merging files
(SURVEY.md §2.6: sequential batch loop + filesystem sharding + NCCL only in
the external ultralytics trainer). Here scale-out is first-class: a
jax.sharding.Mesh with ('data', 'model') axes carries data parallelism over
videos/frames and tensor parallelism over conv channels; collectives ride
ICI via GSPMD; trajectory aggregation is a device-side segment reduction
with prefix-sum ID offsetting.
"""

from geotrax_tpu.parallel.mesh import (
    make_hybrid_mesh,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_params,
)

__all__ = ["make_hybrid_mesh", "make_mesh", "make_train_step", "shard_batch",
           "shard_params"]
