"""geotrax-tpu: TPU-native georeferenced trajectory extraction from BEV drone video.

A ground-up JAX/XLA/Pallas re-design of the capabilities of rfonod/geo-trax
(reference: /root/reference, v1.1.0): video decode -> YOLOv8 aerial vehicle
detection -> multi-object tracking -> homography stabilization -> orthophoto
georeferencing -> kinematics / lane assignment -> aggregation, visualization,
plotting.  The compute path (detection, NMS, Kalman trackers, association,
feature matching, RANSAC, CRS math, smoothing) runs on-device under jit with
static shapes; host code handles codecs, files and orchestration.

Public CLI surface and all on-disk file schemas are compatible with the
reference (see reference README.md "Output file formats").
"""

__version__ = "0.1.0"
