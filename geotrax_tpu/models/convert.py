"""Checkpoint conversion: torch .pt (ultralytics layout) -> JAX parameter trees.

The bundled reference detector ships as an ultralytics torch checkpoint
(hf://rfonod/geo-trax/geotrax_hbb_yolov8s_1920_v1.pt). This module reads such
checkpoints with torch (CPU) and maps the conv/bn weights onto our Flax
YOLOv8 parameter tree; it also reads/writes our native .npz export carrying
the params plus metadata (class names, imgsz, variant).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def read_class_names(model_path: Path) -> Optional[dict]:
    """Extract {class_id: name} from a checkpoint file, or None."""
    model_path = Path(model_path)
    if not model_path.is_file():
        return None
    if model_path.suffix == ".npz":
        with np.load(model_path, allow_pickle=True) as data:
            if "class_names" in data:
                raw = data["class_names"].item()
                return {int(k): str(v) for k, v in raw.items()}
        return None
    if model_path.suffix == ".pt":
        import torch

        ckpt = torch.load(model_path, map_location="cpu", weights_only=False)
        if isinstance(ckpt, dict) and isinstance(ckpt.get("class_names"), dict):
            return {int(k): str(v) for k, v in ckpt["class_names"].items()}
        model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        names = getattr(model, "names", None)
        if isinstance(names, dict):
            return {int(k): str(v) for k, v in names.items()}
        if isinstance(names, (list, tuple)):
            return {i: str(v) for i, v in enumerate(names)}
    return None


def torch_state_dict(model_path: Path) -> dict:
    """Flat {name: numpy array} state dict from an ultralytics .pt checkpoint."""
    import torch

    ckpt = torch.load(Path(model_path), map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:  # our own pt export
        ckpt = ckpt["state_dict"]
    model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(model, "float"):
        model = model.float()
    state = model.state_dict() if hasattr(model, "state_dict") else model
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


_BN_EPS = 1e-3  # ultralytics BatchNorm2d(eps=0.001)


def _fold_conv_bn(sd: dict, prefix: str) -> dict:
    """torch Conv2d+BatchNorm2d -> {'w': HWIO, 'b': (C,)} with BN folded."""
    w = sd[f"{prefix}.conv.weight"]  # (O, I, kh, kw)
    gamma = sd[f"{prefix}.bn.weight"]
    beta = sd[f"{prefix}.bn.bias"]
    mean = sd[f"{prefix}.bn.running_mean"]
    var = sd[f"{prefix}.bn.running_var"]
    scale = gamma / np.sqrt(var + _BN_EPS)
    w_folded = w * scale[:, None, None, None]
    b = beta - mean * scale
    return {"w": np.transpose(w_folded, (2, 3, 1, 0)).astype(np.float32),
            "b": b.astype(np.float32)}


def _plain_conv(sd: dict, prefix: str) -> dict:
    """torch Conv2d with bias (detect-head final 1x1) -> {'w','b'}."""
    w = sd[f"{prefix}.weight"]
    b = sd.get(f"{prefix}.bias", np.zeros(w.shape[0], np.float32))
    return {"w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
            "b": np.asarray(b, np.float32)}


def _c2f_params(sd: dict, prefix: str) -> dict:
    n = 0
    while f"{prefix}.m.{n}.cv1.conv.weight" in sd:
        n += 1
    return {
        "cv1": _fold_conv_bn(sd, f"{prefix}.cv1"),
        "cv2": _fold_conv_bn(sd, f"{prefix}.cv2"),
        "m": [
            {"cv1": _fold_conv_bn(sd, f"{prefix}.m.{i}.cv1"),
             "cv2": _fold_conv_bn(sd, f"{prefix}.m.{i}.cv2")}
            for i in range(n)
        ],
    }


def infer_spec(sd: dict):
    """Deduce the YOLOv8 variant/nc (and P2-ness: yolov8-p2.yaml's Detect
    lives at model.28 instead of model.22) from a state dict's layout."""
    from geotrax_tpu.models.yolov8 import ModelSpec, SCALES

    p2 = "model.28.cv3.0.2.weight" in sd
    head = 28 if p2 else 22
    stem_out = sd["model.0.conv.weight"].shape[0]
    nc = sd[f"model.{head}.cv3.0.2.weight"].shape[0]
    reg_max = sd[f"model.{head}.cv2.0.2.weight"].shape[0] // 4
    for variant, (_, w, _) in SCALES.items():
        if int(np.ceil(64 * w / 8) * 8) == stem_out:
            return ModelSpec(variant=variant, nc=int(nc), reg_max=int(reg_max),
                             p2=p2)
    raise ValueError(f"Cannot infer YOLOv8 variant from stem width {stem_out}")


def convert_ultralytics(sd: dict, spec=None) -> tuple:
    """Flat torch state dict (ultralytics DetectionModel) -> (params, spec).

    Layer indices follow yolov8.yaml (see yolov8.backbone_plan); BN is folded
    so every Conv block becomes one fused conv+bias+SiLU on device.
    """
    from geotrax_tpu.models.yolov8 import backbone_plan

    if spec is None:
        spec = infer_spec(sd)
    plan = backbone_plan(spec)
    layers: dict = {}
    for i, (kind, _args) in plan.items():
        prefix = f"model.{i}"
        if kind == "conv":
            layers[str(i)] = _fold_conv_bn(sd, prefix)
        elif kind == "c2f":
            layers[str(i)] = _c2f_params(sd, prefix)
        else:  # sppf
            layers[str(i)] = {
                "cv1": _fold_conv_bn(sd, f"{prefix}.cv1"),
                "cv2": _fold_conv_bn(sd, f"{prefix}.cv2"),
            }

    cv2_list, cv3_list = [], []
    head = spec.head_index
    for k in range(len(spec.strides)):
        cv2_list.append([
            _fold_conv_bn(sd, f"model.{head}.cv2.{k}.0"),
            _fold_conv_bn(sd, f"model.{head}.cv2.{k}.1"),
            _plain_conv(sd, f"model.{head}.cv2.{k}.2"),
        ])
        cv3_list.append([
            _fold_conv_bn(sd, f"model.{head}.cv3.{k}.0"),
            _fold_conv_bn(sd, f"model.{head}.cv3.{k}.1"),
            _plain_conv(sd, f"model.{head}.cv3.{k}.2"),
        ])
    layers[str(head)] = {"cv2": cv2_list, "cv3": cv3_list}
    return {"layers": layers}, spec


def load_model(model_path: Path):
    """Load a detector checkpoint (.pt torch or .npz native) ->
    (params, spec, class_names)."""
    from geotrax_tpu.models.yolov8 import ModelSpec

    model_path = Path(model_path)
    if model_path.suffix == ".pt":
        sd = torch_state_dict(model_path)
        params, spec = convert_ultralytics(sd)
        names = read_class_names(model_path)
        return params, spec, names
    if model_path.suffix == ".npz":
        params, meta = load_npz(model_path)
        spec = ModelSpec(
            variant=str(meta.get("variant", "s")),
            nc=int(meta.get("nc", 4)),
            reg_max=int(meta.get("reg_max", 16)),
            p2=bool(int(meta.get("p2", 0))),
        )
        # load_npz reconstructs dicts keyed by strings; restore detect-head lists
        params = _restore_lists(params)
        return params, spec, meta.get("class_names")
    raise ValueError(f"Unsupported model format: {model_path}")


def _restore_lists(node):
    """Convert {'0': ..., '1': ...} dicts (from npz flattening) back to lists.

    Only dicts whose digit keys form the exact contiguous range 0..n-1 become
    lists; the YOLOv8 'layers' dict is also all-digit-keyed ('0'..'22') but
    has gaps (no layer 10/11/13/...), so it stays a dict.
    """
    if isinstance(node, dict):
        keys = list(node.keys())
        contiguous = (
            keys
            and all(k.isdigit() for k in keys)
            and sorted(int(k) for k in keys) == list(range(len(keys)))
        )
        if contiguous:
            return [_restore_lists(node[str(i)]) for i in range(len(keys))]
        return {k: _restore_lists(v) for k, v in node.items()}
    return node


def save_npz(path: Path, params: dict, class_names: Optional[dict] = None, **meta) -> None:
    """Save a flattened JAX parameter tree plus metadata as .npz."""
    import jax

    flat = {}
    for keypath, value in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        flat[f"param:{name}"] = np.asarray(value)
    if class_names is not None:
        flat["class_names"] = np.array(class_names, dtype=object)
    for key, value in meta.items():
        flat[f"meta:{key}"] = np.array(value)
    np.savez(Path(path), **flat)


def load_npz(path: Path) -> tuple[dict, dict]:
    """Load (nested params, metadata) from a .npz written by save_npz."""
    params: dict = {}
    meta: dict = {}
    with np.load(Path(path), allow_pickle=True) as data:
        for key in data.files:
            if key.startswith("param:"):
                node = params
                parts = key[len("param:"):].split("/")
                for part in parts[:-1]:
                    node = node.setdefault(part, {})
                node[parts[-1]] = data[key]
            elif key == "class_names":
                meta["class_names"] = {int(k): str(v) for k, v in data[key].item().items()}
            elif key.startswith("meta:"):
                meta[key[len("meta:"):]] = data[key].item()
    return params, meta


def _unfold_conv_bn(p: dict, prefix: str, out: dict) -> None:
    """{'w' HWIO folded, 'b'} -> ultralytics Conv(conv bias-less + BN) keys.

    The fold is not uniquely invertible, so emit the canonical identity-BN
    form: conv.weight carries the folded weights, BN has mean=0,
    var=1-eps, gamma=1, beta=b — with ultralytics' eps=1e-3 the BN scale is
    sqrt((1-eps)+eps)=1 exactly, so torch inference reproduces the folded
    conv bit-for-bit (up to f32 rounding)."""
    w = np.transpose(np.asarray(p["w"], np.float32), (3, 2, 0, 1))  # HWIO->OIHW
    cout = w.shape[0]
    out[f"{prefix}.conv.weight"] = w
    out[f"{prefix}.bn.weight"] = np.ones(cout, np.float32)
    out[f"{prefix}.bn.bias"] = np.asarray(p["b"], np.float32)
    out[f"{prefix}.bn.running_mean"] = np.zeros(cout, np.float32)
    out[f"{prefix}.bn.running_var"] = np.full(cout, 1.0 - _BN_EPS, np.float32)
    out[f"{prefix}.bn.num_batches_tracked"] = np.asarray(0, np.int64)


def _export_c2f(p: dict, prefix: str, out: dict) -> None:
    _unfold_conv_bn(p["cv1"], f"{prefix}.cv1", out)
    _unfold_conv_bn(p["cv2"], f"{prefix}.cv2", out)
    for i, m in enumerate(p["m"]):
        _unfold_conv_bn(m["cv1"], f"{prefix}.m.{i}.cv1", out)
        _unfold_conv_bn(m["cv2"], f"{prefix}.m.{i}.cv2", out)


def export_ultralytics_state_dict(params: dict, spec) -> dict:
    """Inverse of convert_ultralytics: JAX parameter tree -> flat
    ultralytics-layout {name: numpy array} state dict (identity BN). The
    result round-trips through convert_ultralytics exactly and can be
    torch.save'd / load_state_dict'ed into an ultralytics DetectionModel of
    the same variant — the interop path for weights trained with train/
    (reference exports via ultralytics, train/export.sh)."""
    from geotrax_tpu.models.yolov8 import backbone_plan

    plan = backbone_plan(spec)
    layers = params["layers"]
    out: dict = {}
    for i, (kind, _args) in plan.items():
        p = layers[str(i)]
        prefix = f"model.{i}"
        if kind == "conv":
            _unfold_conv_bn(p, prefix, out)
        elif kind == "c2f":
            _export_c2f(p, prefix, out)
        else:  # sppf
            _unfold_conv_bn(p["cv1"], f"{prefix}.cv1", out)
            _unfold_conv_bn(p["cv2"], f"{prefix}.cv2", out)
    hidx = spec.head_index
    head = layers[str(hidx)]
    for branch in ("cv2", "cv3"):
        for k in range(len(spec.strides)):
            stack = head[branch][k]
            _unfold_conv_bn(stack[0], f"model.{hidx}.{branch}.{k}.0", out)
            _unfold_conv_bn(stack[1], f"model.{hidx}.{branch}.{k}.1", out)
            w = np.transpose(np.asarray(stack[2]["w"], np.float32), (3, 2, 0, 1))
            out[f"model.{hidx}.{branch}.{k}.2.weight"] = w
            out[f"model.{hidx}.{branch}.{k}.2.bias"] = np.asarray(
                stack[2]["b"], np.float32
            )
    # ultralytics' DFL expectation conv (frozen arange weights)
    out[f"model.{hidx}.dfl.conv.weight"] = np.arange(
        spec.reg_max, dtype=np.float32
    ).reshape(1, spec.reg_max, 1, 1)
    return out


# ---------------------------------------------------------------------------
# RT-DETR (ultralytics RTDETRDetectionModel, rtdetr-l graph)
# ---------------------------------------------------------------------------

def _lin_t(sd: dict, prefix: str) -> dict:
    """torch nn.Linear -> {'w' (in,out), 'b'} (transposed for x @ w)."""
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].T).astype(np.float32),
            "b": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _ln_t(sd: dict, prefix: str) -> dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _mha_t(sd: dict, prefix: str) -> dict:
    """torch nn.MultiheadAttention (packed qkv in_proj)."""
    return {
        "in_w": np.ascontiguousarray(sd[f"{prefix}.in_proj_weight"].T).astype(np.float32),
        "in_b": np.asarray(sd[f"{prefix}.in_proj_bias"], np.float32),
        "out_w": np.ascontiguousarray(sd[f"{prefix}.out_proj.weight"].T).astype(np.float32),
        "out_b": np.asarray(sd[f"{prefix}.out_proj.bias"], np.float32),
    }


def _repconv_merged(sd: dict, prefix: str) -> dict:
    """RepConv (3x3 + 1x1 branches, each Conv+BN) re-parameterized into ONE
    3x3 conv: fold BN per branch, pad the 1x1 kernel to 3x3, sum — exact."""
    b3 = _fold_conv_bn(sd, f"{prefix}.conv1")   # HWIO 3x3
    b1 = _fold_conv_bn(sd, f"{prefix}.conv2")   # HWIO 1x1
    w = b3["w"].copy()
    w[1:2, 1:2] += b1["w"]
    return {"w": w, "b": b3["b"] + b1["b"]}


def _hgblock_t(sd: dict, prefix: str, light: bool, n: int = 6) -> dict:
    out = {}
    for i in range(n):
        if light:
            out[f"m{i}"] = {
                "conv1": _fold_conv_bn(sd, f"{prefix}.m.{i}.conv1"),
                "conv2": _fold_conv_bn(sd, f"{prefix}.m.{i}.conv2"),
            }
        else:
            out[f"m{i}"] = _fold_conv_bn(sd, f"{prefix}.m.{i}")
    out["sc"] = _fold_conv_bn(sd, f"{prefix}.sc")
    out["ec"] = _fold_conv_bn(sd, f"{prefix}.ec")
    return out


def _repc3_t(sd: dict, prefix: str, n: int = 3) -> dict:
    out = {
        "cv1": _fold_conv_bn(sd, f"{prefix}.cv1"),
        "cv2": _fold_conv_bn(sd, f"{prefix}.cv2"),
    }
    for i in range(n):
        out[f"m{i}"] = _repconv_merged(sd, f"{prefix}.m.{i}")
    if f"{prefix}.cv3.conv.weight" in sd:
        out["cv3"] = _fold_conv_bn(sd, f"{prefix}.cv3")
    return out


def _input_proj_t(sd: dict, prefix: str) -> dict:
    """decoder input_proj: Conv2d(bias=False) + BatchNorm2d (plain modules)."""
    w = sd[f"{prefix}.0.weight"]
    gamma = sd[f"{prefix}.1.weight"]
    beta = sd[f"{prefix}.1.bias"]
    mean = sd[f"{prefix}.1.running_mean"]
    var = sd[f"{prefix}.1.running_var"]
    scale = gamma / np.sqrt(var + 1e-5)  # plain nn.BatchNorm2d eps
    w_folded = w * scale[:, None, None, None]
    return {"w": np.transpose(w_folded, (2, 3, 1, 0)).astype(np.float32),
            "b": (beta - mean * scale).astype(np.float32)}


def _mlp_t(sd: dict, prefix: str, n_layers: int) -> dict:
    return {f"l{i}": _lin_t(sd, f"{prefix}.layers.{i}") for i in range(n_layers)}


def infer_rtdetr_spec(sd: dict):
    """ULSpec from an ultralytics RT-DETR state dict (rtdetr-l family)."""
    from geotrax_tpu.models.rtdetr_ul import ULSpec

    stem = sd["model.0.stem1.conv.weight"].shape[0]
    if stem != 32:
        raise NotImplementedError(
            f"Only the rtdetr-l (HGNetv2-L, stem 32) graph is supported; "
            f"this checkpoint has stem width {stem} (rtdetr-x is unsupported)."
        )
    nc = sd["model.28.dec_score_head.0.weight"].shape[0]
    hd = sd["model.28.enc_output.0.weight"].shape[0]
    ndl = 0
    while f"model.28.dec_score_head.{ndl}.weight" in sd:
        ndl += 1
    d_ffn = sd["model.28.decoder.layers.0.linear1.weight"].shape[0]
    return ULSpec(nc=int(nc), hd=int(hd), ndl=ndl, d_ffn=int(d_ffn))


def convert_rtdetr_ultralytics(sd: dict, spec=None) -> tuple:
    """Flat torch state dict (ultralytics RTDETRDetectionModel, rtdetr-l
    graph) -> (params pytree for models/rtdetr_ul.py, ULSpec). BN folded,
    RepConv branches merged (exact transforms; parity pinned by
    tests/test_rtdetr_convert.py against a torch oracle)."""
    if spec is None:
        spec = infer_rtdetr_spec(sd)
    m = "model"
    backbone = {
        "stem": {k: _fold_conv_bn(sd, f"{m}.0.{k}")
                 for k in ("stem1", "stem2a", "stem2b", "stem3", "stem4")},
        "s1": _hgblock_t(sd, f"{m}.1", light=False),
        "dw2": _fold_conv_bn(sd, f"{m}.2"),
        "s2": _hgblock_t(sd, f"{m}.3", light=False),
        "dw3": _fold_conv_bn(sd, f"{m}.4"),
        "s3a": _hgblock_t(sd, f"{m}.5", light=True),
        "s3b": _hgblock_t(sd, f"{m}.6", light=True),
        "s3c": _hgblock_t(sd, f"{m}.7", light=True),
        "dw4": _fold_conv_bn(sd, f"{m}.8"),
        "s4": _hgblock_t(sd, f"{m}.9", light=True),
    }
    encoder = {
        "proj5": _fold_conv_bn(sd, f"{m}.10"),
        "aifi": {
            "ma": _mha_t(sd, f"{m}.11.ma"),
            "fc1": _lin_t(sd, f"{m}.11.fc1"),
            "fc2": _lin_t(sd, f"{m}.11.fc2"),
            "norm1": _ln_t(sd, f"{m}.11.norm1"),
            "norm2": _ln_t(sd, f"{m}.11.norm2"),
        },
        "lat0": _fold_conv_bn(sd, f"{m}.12"),
        "proj4": _fold_conv_bn(sd, f"{m}.14"),
        "fpn0": _repc3_t(sd, f"{m}.16"),
        "lat1": _fold_conv_bn(sd, f"{m}.17"),
        "proj3": _fold_conv_bn(sd, f"{m}.19"),
        "fpn1": _repc3_t(sd, f"{m}.21"),
        "down0": _fold_conv_bn(sd, f"{m}.22"),
        "pan0": _repc3_t(sd, f"{m}.24"),
        "down1": _fold_conv_bn(sd, f"{m}.25"),
        "pan1": _repc3_t(sd, f"{m}.27"),
    }
    dec = f"{m}.28"
    decoder = {
        "enc_output_l": _lin_t(sd, f"{dec}.enc_output.0"),
        "enc_output_ln": _ln_t(sd, f"{dec}.enc_output.1"),
        "enc_score_head": _lin_t(sd, f"{dec}.enc_score_head"),
        "enc_bbox_head": _mlp_t(sd, f"{dec}.enc_bbox_head", 3),
        "query_pos_head": _mlp_t(sd, f"{dec}.query_pos_head", 2),
    }
    for i in range(3):
        decoder[f"input_proj{i}"] = _input_proj_t(sd, f"{dec}.input_proj.{i}")
    for i in range(spec.ndl):
        lp = f"{dec}.decoder.layers.{i}"
        decoder[f"dec_layer{i}"] = {
            "self_attn": _mha_t(sd, f"{lp}.self_attn"),
            "cross_attn": {
                "sampling_offsets": _lin_t(sd, f"{lp}.cross_attn.sampling_offsets"),
                "attention_weights": _lin_t(sd, f"{lp}.cross_attn.attention_weights"),
                "value_proj": _lin_t(sd, f"{lp}.cross_attn.value_proj"),
                "output_proj": _lin_t(sd, f"{lp}.cross_attn.output_proj"),
            },
            "norm1": _ln_t(sd, f"{lp}.norm1"),
            "norm2": _ln_t(sd, f"{lp}.norm2"),
            "norm3": _ln_t(sd, f"{lp}.norm3"),
            "linear1": _lin_t(sd, f"{lp}.linear1"),
            "linear2": _lin_t(sd, f"{lp}.linear2"),
        }
        decoder[f"dec_bbox_head{i}"] = _mlp_t(sd, f"{dec}.dec_bbox_head.{i}", 3)
        decoder[f"dec_score_head{i}"] = _lin_t(sd, f"{dec}.dec_score_head.{i}")
    import jax
    import jax.numpy as jnp

    params = {"backbone": backbone, "encoder": encoder, "decoder": decoder}
    params = jax.tree.map(jnp.asarray, params)
    return params, spec
