"""On-device compute primitives (JAX/XLA/Pallas).

Each module replaces a native library the reference depends on
(SURVEY.md §2.3): boxes/iou/nms for torchvision NMS, kalman/assignment for the
ultralytics tracker internals (numpy KF + lapx LAPJV), filters for scipy
smoothing, homography/ransac for OpenCV robust estimation, tmerc for PROJ,
polygon for GEOS spatial joins, warp for cv2.warpPerspective, features for
ORB/SIFT detection. Everything is jit-friendly: static shapes, masking
instead of dynamic sizes, lax control flow.
"""
