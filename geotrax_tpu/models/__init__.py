"""Detection models (JAX/Flax): YOLOv8 family and weight conversion."""
