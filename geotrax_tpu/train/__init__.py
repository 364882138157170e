"""Detector training: YOLO-format data loading, sharded fine-tuning, eval.

TPU-native counterpart of the reference's train/ layer (SURVEY.md §2.7:
bash wrappers around the ultralytics trainer with torch DDP/NCCL + SLURM).
Here training is a jitted optax step sharded over a ('data','model') mesh
(geotrax_tpu/parallel), consuming the same YOLO-format datasets
(images/ + labels/*.txt) and the same hyperparameter surface (the config's
ultralytics section: lr0/lrf/momentum/weight_decay/warmup_epochs/box/cls/
dfl/epochs/batch/imgsz), with mAP@50 / mAP@50-95 evaluation.
"""
