"""Detector training loop (fine-tuning and from-scratch), mesh-sharded.

CLI:  python -m geotrax_tpu.train --data <dataset_dir> [--model m.pt|.npz]
                                  [--cfg default] [--epochs N] ...

Replaces the reference's train/train.sh -> ultralytics trainer -> torch DDP
chain (SURVEY.md §2.7): hyperparameters come from the same config surface
(cfg ultralytics: lr0, lrf, momentum, weight_decay, warmup_epochs, box/cls/
dfl gains, epochs, batch, imgsz, patience), the optimizer is SGD with
momentum + warmup + (optionally cosine) decay, the step is jitted and
sharded over a ('data','model') mesh, checkpoints are written as native
.npz (last.npz / best.npz, by val mAP@50), and evaluation reports
precision / recall / mAP@50 / mAP@50-95.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np


def build_lr_schedule(lr0: float, lrf: float, warmup_steps: int, total_steps: int,
                      cos_lr: bool):
    import optax

    decay = (
        optax.cosine_decay_schedule(lr0, max(total_steps - warmup_steps, 1), alpha=lrf)
        if cos_lr else
        optax.linear_schedule(lr0, lr0 * lrf, max(total_steps - warmup_steps, 1))
    )
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr0, max(warmup_steps, 1)), decay],
        [max(warmup_steps, 1)],
    )


from functools import lru_cache


@lru_cache(maxsize=4)
def _make_infer(spec, conf: float, iou: float, max_det: int):
    """One jitted val-inference function per (spec, thresholds) — defining it
    inside evaluate() re-traced and re-compiled the whole forward+NMS graph
    every epoch (tens of seconds each on TPU)."""
    import jax

    from geotrax_tpu.models import yolov8
    from geotrax_tpu.ops.nms import postprocess_detections

    @jax.jit
    def infer(p, images):
        boxes, probs = yolov8.forward(p, images, spec)
        return jax.vmap(
            lambda b, pr: postprocess_detections(b, pr, conf, iou, max_det, agnostic=False)
        )(boxes, probs)

    return infer


def evaluate(params, spec, loader, conf=0.001, iou=0.7, max_det=300,
             single_cls: bool = False) -> dict:
    """Run validation and compute the detection metrics.

    ``single_cls=True`` re-scores the same predictions class-agnostically
    (every prediction and GT mapped to class 0) — the reference's separate
    single-class val pass (reference train/train.sh val stanzas)."""
    import jax
    import jax.numpy as jnp

    from geotrax_tpu.train.metrics import evaluate_detections

    infer = _make_infer(spec, conf, iou, max_det)
    predictions, ground_truths = [], []
    for batch in loader.epoch(0):
        det = infer(params, jnp.asarray(batch["images"]))
        det = jax.tree.map(np.asarray, det)
        # padded tail rows (validation ceil-batching) carry no real image
        for i in range(int(batch.get("n_valid", len(batch["images"])))):
            valid = det["valid"][i]
            classes = det["classes"][i][valid]
            gt_mask = batch["gt_mask"][i]
            gt_cls = batch["gt_cls"][i][gt_mask]
            if single_cls:
                classes = np.zeros_like(classes)
                gt_cls = np.zeros_like(gt_cls)
            predictions.append({
                "boxes_xywh": det["boxes_xywh"][i][valid],
                "scores": det["scores"][i][valid],
                "classes": classes,
            })
            ground_truths.append({
                "boxes_xywh": batch["gt_boxes"][i][gt_mask],
                "classes": gt_cls,
            })
    return evaluate_detections(predictions, ground_truths,
                               1 if single_cls else spec.nc)


def save_trainer_state(path, opt_state, epoch: int, best_map: float,
                       bad_epochs: int) -> None:
    """Checkpoint the optimizer state + loop counters for --resume.

    optax states are pytrees whose STRUCTURE is reproducible from the same
    (params, tx) pair, so only the leaves need persisting; resume rebuilds
    the template with tx.init(params) and unflattens the saved leaves into
    it. Reference scope anchor: ultralytics resume from last.pt
    (/root/reference/train/train.sh:175-176,240-242)."""
    import jax

    leaves = jax.tree_util.tree_leaves(opt_state)
    np.savez(
        path,
        _meta=np.asarray([float(epoch), float(best_map), float(bad_epochs)]),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_trainer_state(path, template_opt_state):
    """-> (opt_state, next_epoch, best_map, bad_epochs)."""
    import jax

    treedef = jax.tree_util.tree_structure(template_opt_state)
    template_leaves = jax.tree_util.tree_leaves(template_opt_state)
    with np.load(path) as z:
        meta = z["_meta"]
        leaves = [z[f"leaf_{i}"] for i in range(len(template_leaves))]
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return opt_state, int(meta[0]) + 1, float(meta[1]), int(meta[2])


def train(args, logger=None) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from geotrax_tpu.models import yolov8
    from geotrax_tpu.models.convert import load_model, save_npz
    from geotrax_tpu.parallel import (
        make_hybrid_mesh, make_mesh, shard_batch, shard_params,
    )
    from geotrax_tpu.train.data import Loader
    from geotrax_tpu.utils.config_utils import load_config
    from geotrax_tpu.utils.logging_utils import setup_logger

    logger = logger or setup_logger("geotrax.train", args.verbose)
    hp = load_config(args.cfg, logger).get("ultralytics", {})

    imgsz = int(args.imgsz or hp.get("imgsz", 640))
    batch = int(args.batch or hp.get("batch", 8))
    epochs = int(args.epochs or hp.get("epochs", 100))
    lr0 = float(hp.get("lr0", 0.01))
    lrf = float(hp.get("lrf", 0.01))
    momentum = float(hp.get("momentum", 0.937))
    weight_decay = float(hp.get("weight_decay", 5e-4))
    warmup_epochs = float(hp.get("warmup_epochs", 3.0))
    patience = int(hp.get("patience", 50))

    resume = bool(getattr(args, "resume", False))
    out_dir = Path(args.out)
    # model: resumed, pretrained (converted), or fresh
    if resume:
        last = out_dir / "last.npz"
        state_path = out_dir / "trainer_state.npz"
        if not last.exists() or not state_path.exists():
            raise SystemExit(
                f"--resume needs {last} and {state_path} from a previous run")
        params, spec, _names = load_model(last)
        params = jax.tree.map(jnp.asarray, params)
        logger.info(f"Resuming from '{last}' (yolov8{spec.variant}, nc={spec.nc}).")
    elif args.model:
        params, spec, _names = load_model(Path(args.model))
        params = jax.tree.map(jnp.asarray, params)
        logger.info(f"Fine-tuning from '{args.model}' (yolov8{spec.variant}, nc={spec.nc}).")
    else:
        # reference train.sh model matrix accepts yolov8{n,s,m,l,x}[-p2]
        v = args.variant
        p2 = v.endswith("-p2")
        spec = yolov8.ModelSpec(variant=v[:-3] if p2 else v, nc=args.nc, p2=p2)
        params = yolov8.init_params(jax.random.PRNGKey(int(hp.get("seed", 0) or 0)), spec)
        logger.info(f"Training yolov8{spec.variant} (nc={spec.nc}) from scratch.")

    train_loader = Loader(args.data, "train", imgsz=imgsz, batch_size=batch,
                          max_gt=args.max_gt, training=True,
                          fraction=float(hp.get("fraction", 1.0)))
    val_loader = Loader(args.data, "val", imgsz=imgsz, batch_size=batch,
                        max_gt=args.max_gt, training=False)

    steps_per_epoch = len(train_loader)
    total_steps = steps_per_epoch * epochs
    schedule = build_lr_schedule(
        lr0, lrf, int(warmup_epochs * steps_per_epoch), total_steps,
        bool(hp.get("cos_lr", False)),
    )
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(schedule, momentum=momentum, nesterov=True),
    )

    if getattr(args, "slices", None) and args.slices > 1:
        # multi-slice pod: data parallelism crosses the DCN on the 'slice'
        # axis, tensor parallelism stays on in-slice ICI (parallel/mesh.py)
        mesh = make_hybrid_mesh(args.slices, args.devices)
    else:
        mesh = make_mesh(args.devices)
    from geotrax_tpu.parallel import make_train_step

    box_gain = float(hp.get("box", 7.5))
    cls_gain = float(hp.get("cls", 0.5))
    dfl_gain = float(hp.get("dfl", 1.5))
    # the ONE sharded train step (parallel/mesh.py) — an inline copy here
    # had already drifted (it dropped the sharding constraints)
    step = make_train_step(spec, tx, mesh, box_gain, cls_gain, dfl_gain)

    out_dir.mkdir(parents=True, exist_ok=True)
    best_map = -1.0
    bad_epochs = 0
    start_epoch = 0
    history = []
    if resume and (out_dir / "metrics.jsonl").exists():
        # rebuild the in-memory history from the per-epoch JSONL (written
        # incrementally, so it survives the kill that made resume necessary)
        history = [json.loads(ln)
                   for ln in (out_dir / "metrics.jsonl").read_text().splitlines()
                   if ln.strip()]
    # persisted metrics (Comet ML analog, reference train/README.md:184-201):
    # results.csv + metrics.jsonl + TensorBoard events, flushed per epoch
    from geotrax_tpu.train.runlog import RunLogger

    if jax.process_index() == 0:
        runlog = RunLogger(out_dir, enable_tensorboard=not getattr(args, "no_tb", False))
    else:  # secondary pod workers: no filesystem writes
        class _NullLog:
            def log_epoch(self, *a, **k):
                pass

            def close(self):
                pass

        runlog = _NullLog()

    with mesh:
        params = shard_params(params, mesh)
        opt_state = tx.init(params)
        if resume:
            opt_state, start_epoch, best_map, bad_epochs = load_trainer_state(
                out_dir / "trainer_state.npz", opt_state)
            opt_state = jax.tree.map(jnp.asarray, opt_state)
            logger.info(f"Resumed at epoch {start_epoch} "
                        f"(best mAP@50 {best_map:.4f}, {bad_epochs} stagnant).")
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            losses = []
            for batch_np in train_loader.epoch(epoch):
                batch_np.pop("n_valid", None)  # loader bookkeeping, not data
                b = shard_batch(jax.tree.map(jnp.asarray, batch_np), mesh)
                params, opt_state, metrics = step(params, opt_state, b)
                losses.append(float(metrics["loss"]))
            mean_loss = float(np.mean(losses)) if losses else float("nan")

            val = evaluate(params, spec, val_loader)
            lr_now = float(schedule(min((epoch + 1) * steps_per_epoch, total_steps)))
            history.append({"epoch": epoch, "loss": mean_loss, **val})
            # per-class P/R/mAP ride along as flat scalar columns
            # (reference README.md:192-200 reports the full per-class table)
            flat_pc = {
                f"{m}_{c}": v[m]
                for c, v in val.get("per_class", {}).items()
                for m in ("precision", "recall", "ap50", "ap50_95")
            }
            runlog.log_epoch(epoch, {
                "loss": mean_loss,
                **{k: v for k, v in val.items()
                   if k not in ("per_class", "per_class_ap50")},
                **flat_pc, "lr": lr_now,
                "epoch_s": round(time.time() - t0, 2),
            })
            logger.info(
                f"epoch {epoch + 1}/{epochs}: loss {mean_loss:.4f} "
                f"mAP50 {val['map50']:.4f} mAP50-95 {val['map50_95']:.4f} "
                f"({time.time() - t0:.1f}s)"
            )

            # tensor-parallel shards can span hosts: replicate on device
            # first (np.asarray on a non-addressable jax.Array raises), and
            # let only process 0 write — N workers racing on one shared
            # last.npz/results.csv corrupts both
            if jax.process_count() > 1:
                from jax.sharding import NamedSharding, PartitionSpec

                rep = jax.jit(lambda p: p,
                              out_shardings=NamedSharding(mesh, PartitionSpec()))
                host_params = jax.tree.map(np.asarray, rep(params))
            else:
                host_params = jax.tree.map(np.asarray, params)
            is_writer = jax.process_index() == 0
            if is_writer:
                save_npz(out_dir / "last.npz", host_params,
                         class_names={i: str(i) for i in range(spec.nc)},
                         variant=spec.variant, nc=spec.nc, reg_max=spec.reg_max,
                         p2=int(spec.p2))
            if val["map50"] > best_map:
                best_map = val["map50"]
                bad_epochs = 0
                if is_writer:
                    save_npz(out_dir / "best.npz", host_params,
                             class_names={i: str(i) for i in range(spec.nc)},
                             variant=spec.variant, nc=spec.nc, reg_max=spec.reg_max,
                             p2=int(spec.p2))
            else:
                bad_epochs += 1
            # optimizer-state + loop-counter checkpoint: a preempted
            # pod-slice run resumes from here with --resume instead of
            # starting over
            if is_writer:
                save_trainer_state(out_dir / "trainer_state.npz", opt_state,
                                   epoch, best_map, bad_epochs)
            if bad_epochs >= patience:
                logger.notice(f"Early stop after {patience} stagnant epochs.")
                break

        # final single-class validation pass: class-agnostic P/R/mAP of the
        # last checkpoint (the reference's separate single_cls val run)
        val_single = evaluate(params, spec, val_loader, single_cls=True)
        logger.info(
            f"single-class val: P {val_single['precision']:.4f} "
            f"R {val_single['recall']:.4f} mAP50 {val_single['map50']:.4f} "
            f"mAP50-95 {val_single['map50_95']:.4f}"
        )

    runlog.close()
    if jax.process_index() == 0:
        summary = {
            "history": history,
            "single_cls_val": {k: v for k, v in val_single.items()
                               if k not in ("per_class", "per_class_ap50")},
        }
        (out_dir / "history.json").write_text(json.dumps(history, indent=2))
        (out_dir / "val_summary.json").write_text(json.dumps(summary, indent=2))
    logger.notice(f"Training done: best mAP@50 {best_map:.4f}; checkpoints in '{out_dir}'.")
    return {"best_map50": best_map, "history": history,
            "single_cls_val": val_single}


def parse_cli_args():
    parser = argparse.ArgumentParser(description="Train/fine-tune the JAX YOLOv8 detector")
    parser.add_argument("--data", type=Path, required=True,
                        help="Dataset root (images/{train,val} + labels/{train,val})")
    parser.add_argument("--model", type=str, default=None,
                        help="Pretrained checkpoint (.pt or .npz); omit to train from scratch")
    parser.add_argument("--variant", type=str, default="s",
                        choices=[v + sfx for v in "nsmlx" for sfx in ("", "-p2")])
    parser.add_argument("--nc", type=int, default=4, help="Number of classes")
    parser.add_argument("--cfg", "-c", type=str, default="default")
    parser.add_argument("--imgsz", type=int, default=None)
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--max-gt", type=int, default=64, dest="max_gt")
    parser.add_argument("--devices", type=int, default=None, help="Mesh device count")
    parser.add_argument("--slices", type=int, default=None,
                        help="Multi-slice pod: shard data-parallelism across "
                             "N slices over DCN (hybrid mesh)")
    parser.add_argument("--multihost", action="store_true",
                        help="Initialize jax.distributed for a multi-host pod slice "
                             "(each worker launched via train/launch.sh runs the same "
                             "command; the TPU runtime supplies coordinator/topology)")
    parser.add_argument("--out", type=Path, default=Path("runs/train"))
    parser.add_argument("--resume", action="store_true",
                        help="Resume a killed/preempted run from <out>/last.npz "
                             "+ <out>/trainer_state.npz (optimizer state, epoch, "
                             "best-mAP and patience counters all restored)")
    parser.add_argument("--no-tb", action="store_true", dest="no_tb",
                        help="Disable TensorBoard event files (results.csv/metrics.jsonl always written)")
    parser.add_argument("--verbose", "-v", action="store_true")
    return parser.parse_args()


def main():
    args = parse_cli_args()
    if args.multihost or os.environ.get("GEOTRAX_MULTIHOST"):
        # pod-slice scale-out (the reference's SLURM wrapper analog,
        # train/launch.sh): jax.distributed wires all workers into one
        # global device mesh. Every host decodes the full global batch and
        # shard_batch places each host's addressable shard — redundant IO,
        # correct results; per-process loader sharding is a future lever.
        import jax

        jax.distributed.initialize()
    train(args)


if __name__ == "__main__":
    main()
