"""Multi-object trackers (TPU-native, slot-based, jit-friendly).

Re-implements the six config-selectable trackers of the reference
(SURVEY.md §2.4; cfg tracker.*): botsort, bytetrack, ocsort, deepocsort,
fasttrack, tracktrack. All share one vmapped-Kalman + batched-IoU +
assignment core (geotrax_tpu/ops) with tracker-specific cost assembly and
state-machine flags, over a fixed track-slot array so every step is a pure
function scannable over frames.
"""

from geotrax_tpu.track.base import TrackerState, make_tracker

__all__ = ["TrackerState", "make_tracker"]
