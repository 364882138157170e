"""Stabilization engine (Stabilo-equivalent, TPU-native)."""

from geotrax_tpu.stabilize.stabilizer import Stabilizer

__all__ = ["Stabilizer"]
