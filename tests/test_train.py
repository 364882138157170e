"""Training subsystem: dataset loading, mAP evaluator correctness, and a
short end-to-end training run on a synthetic dataset (loss decreases, mAP
improves over random init)."""

import argparse
import json
from pathlib import Path

import numpy as np
import pytest

from geotrax_tpu.train.metrics import evaluate_detections


# ---------------------------------------------------------------- metrics
def test_map_perfect_predictions():
    gt = [{"boxes_xywh": np.array([[50.0, 50, 20, 10], [100, 100, 30, 12]]),
           "classes": np.array([0, 1])}]
    pred = [{"boxes_xywh": gt[0]["boxes_xywh"].copy(),
             "scores": np.array([0.9, 0.8]),
             "classes": np.array([0, 1])}]
    m = evaluate_detections(pred, gt, num_classes=2)
    # 101-point interpolation caps perfect AP just below 1.0
    assert m["map50"] == pytest.approx(1.0, abs=0.01)
    assert m["map50_95"] == pytest.approx(1.0, abs=0.01)
    assert m["recall"] == pytest.approx(1.0, abs=1e-3)


def test_map_no_predictions():
    gt = [{"boxes_xywh": np.array([[50.0, 50, 20, 10]]), "classes": np.array([0])}]
    pred = [{"boxes_xywh": np.zeros((0, 4)), "scores": np.zeros(0), "classes": np.zeros(0, int)}]
    m = evaluate_detections(pred, gt, num_classes=1)
    assert m["map50"] == 0.0


def test_map_half_matched():
    gt = [{"boxes_xywh": np.array([[50.0, 50, 20, 10], [200, 200, 20, 10]]),
           "classes": np.array([0, 0])}]
    pred = [{"boxes_xywh": np.array([[50.0, 50, 20, 10], [400, 400, 20, 10]]),
             "scores": np.array([0.9, 0.8]),
             "classes": np.array([0, 0])}]
    m = evaluate_detections(pred, gt, num_classes=1)
    assert 0.2 < m["map50"] < 0.75
    assert m["recall"] == pytest.approx(0.5, abs=1e-3)


def test_map_localization_quality_matters():
    gt = [{"boxes_xywh": np.array([[50.0, 50, 20, 10]]), "classes": np.array([0])}]
    # 2px center offset: IoU ~0.67 -> counts at 0.5 but not at 0.7+
    pred = [{"boxes_xywh": np.array([[52.0, 50, 20, 10]]),
             "scores": np.array([0.9]), "classes": np.array([0])}]
    m = evaluate_detections(pred, gt, num_classes=1)
    assert m["map50"] == pytest.approx(1.0, abs=0.01)
    assert m["map50_95"] < 0.75


# ---------------------------------------------------------------- dataset
@pytest.fixture()
def synth_dataset(tmp_path):
    """Tiny detection dataset: bright elongated boxes on dark texture."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, n in (("train", 16), ("val", 6)):
        (tmp_path / "images" / split).mkdir(parents=True)
        (tmp_path / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = rng.integers(20, 60, (96, 96, 3)).astype(np.uint8)
            labels = []
            for _ in range(rng.integers(1, 3)):
                cx, cy = rng.uniform(0.25, 0.75, 2)
                w, h = 0.3, 0.15
                x0, y0 = int((cx - w / 2) * 96), int((cy - h / 2) * 96)
                img[y0:y0 + int(h * 96), x0:x0 + int(w * 96)] = (250, 240, 90)
                labels.append(f"0 {cx:.4f} {cy:.4f} {w:.4f} {h:.4f}")
            Image.fromarray(img).save(tmp_path / "images" / split / f"{i}.png")
            (tmp_path / "labels" / split / f"{i}.txt").write_text("\n".join(labels))
    return tmp_path


def test_loader_shapes(synth_dataset):
    from geotrax_tpu.train.data import Loader

    loader = Loader(synth_dataset, "train", imgsz=96, batch_size=4, max_gt=8)
    batch = next(iter(loader.epoch(0)))
    assert batch["images"].shape == (4, 96, 96, 3)
    assert batch["gt_boxes"].shape == (4, 8, 4)
    assert batch["gt_mask"].any()
    assert batch["images"].max() <= 1.0


def test_loader_letterbox_boxes_in_pixels(synth_dataset):
    from geotrax_tpu.train.data import Loader

    loader = Loader(synth_dataset, "val", imgsz=96, batch_size=2, max_gt=8, training=False)
    batch = next(iter(loader.epoch(0)))
    boxes = batch["gt_boxes"][batch["gt_mask"]]
    assert (boxes[:, 0] > 1).all() and (boxes[:, 0] < 95).all()  # absolute px


@pytest.mark.slow
def test_short_training_improves(synth_dataset, tmp_path):
    """Five epochs of yolov8n@96 on the synthetic boxes: loss must drop and
    final mAP must beat the random-init baseline."""
    from geotrax_tpu.train.train import train

    args = argparse.Namespace(
        data=synth_dataset, model=None, variant="n", nc=1, cfg="default",
        imgsz=96, batch=8, epochs=5, max_gt=8, devices=None,
        out=tmp_path / "run", verbose=False,
    )
    result = train(args)
    history = result["history"]
    assert len(history) >= 3
    assert history[-1]["loss"] < history[0]["loss"], "loss did not decrease"
    assert (tmp_path / "run" / "last.npz").exists()
    assert (tmp_path / "run" / "history.json").exists()
    json.loads((tmp_path / "run" / "history.json").read_text())
    # persisted per-epoch metrics (Comet analog): incremental CSV + JSONL
    csv_lines = (tmp_path / "run" / "results.csv").read_text().splitlines()
    assert len(csv_lines) == len(history) + 1  # header + one row per epoch
    assert csv_lines[0].startswith("epoch,loss,")
    jsonl = [json.loads(l) for l in
             (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    assert len(jsonl) == len(history)
    assert {"loss", "map50", "lr", "epoch_s"} <= set(jsonl[0])


@pytest.mark.slow
def test_kill_and_resume_matches_uninterrupted(synth_dataset, tmp_path):
    """Interrupt after epoch 2, resume with --resume, and match an
    uninterrupted run: same per-epoch losses, same LR schedule position,
    same final weights (optimizer state + counters restored from
    trainer_state.npz). Reference anchor: ultralytics resume from last.pt
    (/root/reference/train/train.sh:175-176,240-242)."""
    from geotrax_tpu.train.train import train

    def make_args(out, epochs, resume=False):
        return argparse.Namespace(
            data=synth_dataset, model=None, variant="n", nc=1, cfg="default",
            imgsz=96, batch=8, epochs=epochs, max_gt=8, devices=None,
            out=out, verbose=False, resume=resume,
        )

    full = train(make_args(tmp_path / "full", 4))

    # "kill" after epoch 2 by running only 2 epochs, then resume to 4
    train(make_args(tmp_path / "resumed", 2))
    assert (tmp_path / "resumed" / "trainer_state.npz").exists()
    resumed = train(make_args(tmp_path / "resumed", 4, resume=True))

    # resumed continues at epoch 2 (no epochs repeated or skipped)
    assert [h["epoch"] for h in resumed["history"]] == [0, 1, 2, 3]
    for a, b in zip(full["history"], resumed["history"]):
        assert a["loss"] == pytest.approx(b["loss"], rel=1e-5), \
            f"epoch {a['epoch']} loss diverged after resume"
        assert a["map50"] == pytest.approx(b["map50"], abs=1e-6)

    # LR schedule continuity: the resumed run's logged lr matches
    jsonl_full = [json.loads(l) for l in
                  (tmp_path / "full" / "metrics.jsonl").read_text().splitlines()]
    jsonl_res = [json.loads(l) for l in
                 (tmp_path / "resumed" / "metrics.jsonl").read_text().splitlines()]
    assert len(jsonl_res) == len(jsonl_full) == 4
    for a, b in zip(jsonl_full, jsonl_res):
        assert a["lr"] == pytest.approx(b["lr"], rel=1e-9)

    # final weights bit-match the uninterrupted run
    with np.load(tmp_path / "full" / "last.npz") as za, \
         np.load(tmp_path / "resumed" / "last.npz") as zb:
        for k in za.files:
            if k.startswith("meta:") or k == "class_names":
                continue
            np.testing.assert_allclose(za[k], zb[k], rtol=1e-5, atol=1e-7,
                                       err_msg=f"weight {k} diverged")

    # single-class val pass rides along in both runs
    assert "single_cls_val" in full and "map50" in full["single_cls_val"]
    summary = json.loads((tmp_path / "full" / "val_summary.json").read_text())
    assert "single_cls_val" in summary


def test_per_class_metrics_surface():
    """evaluate_detections exposes the reference's per-class table
    (P/R/mAP50/mAP50-95 per class, reference README.md:192-200)."""
    gt = [{"boxes_xywh": np.array([[50.0, 50, 20, 10], [100, 100, 30, 12]]),
           "classes": np.array([0, 1])}]
    pred = [{"boxes_xywh": gt[0]["boxes_xywh"].copy(),
             "scores": np.array([0.9, 0.8]),
             "classes": np.array([0, 1])}]
    m = evaluate_detections(pred, gt, num_classes=2)
    assert set(m["per_class"]) == {0, 1}
    for c in (0, 1):
        row = m["per_class"][c]
        assert set(row) == {"precision", "recall", "ap50", "ap50_95"}
        assert row["ap50"] == pytest.approx(1.0, abs=0.01)


def test_runlogger_incremental_and_append(tmp_path):
    """Each log_epoch flushes to disk (history survives a kill); re-opening
    the same dir appends instead of clobbering (resume semantics)."""
    from geotrax_tpu.train.runlog import RunLogger

    rl = RunLogger(tmp_path / "run", enable_tensorboard=False)
    rl.log_epoch(0, {"loss": 2.0, "map50": 0.1})
    # mid-run state is already on disk
    assert len((tmp_path / "run" / "metrics.jsonl").read_text().splitlines()) == 1
    rl.log_epoch(1, {"loss": 1.5, "map50": 0.2})
    rl.close()

    rl2 = RunLogger(tmp_path / "run", enable_tensorboard=False)
    rl2.log_epoch(2, {"loss": 1.2, "map50": 0.3})
    rl2.close()
    rows = (tmp_path / "run" / "results.csv").read_text().splitlines()
    assert len(rows) == 4 and rows[0] == "epoch,loss,map50"
    assert rows[3].startswith("2,")
