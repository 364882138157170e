"""YOLOv8 model: shapes, anchor math, letterbox, and numeric parity of the
JAX forward + BN-folding converter against a torch oracle of the same blocks
(Conv+BN+SiLU / C2f / SPPF with ultralytics layer naming)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geotrax_tpu.models.convert import convert_ultralytics, infer_spec
from geotrax_tpu.models.yolov8 import (
    ModelSpec,
    forward,
    init_params,
    letterbox,
    letterbox_shape,
    make_anchors,
    unletterbox_boxes,
)

torch = pytest.importorskip("torch")
nn = torch.nn


# ---------------------------------------------------------------- torch oracle
class TConv(nn.Module):
    def __init__(self, cin, cout, k=3, s=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(nn.Module):
    def __init__(self, cin, cout, n=1, shortcut=False):
        super().__init__()
        self.c = cout // 2
        self.cv1 = TConv(cin, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, cout, 1)
        self.m = nn.ModuleList(TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, cin, cout, k=5):
        super().__init__()
        c_ = cin // 2
        self.cv1 = TConv(cin, c_, 1)
        self.cv2 = TConv(c_ * 4, cout, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


def _randomize_bn(module):
    """Non-trivial BN statistics so folding bugs can't hide."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)


def _to_jax_input(x_torch):
    return jnp.asarray(x_torch.permute(0, 2, 3, 1).numpy())


# ---------------------------------------------------------------- block parity
def test_conv_block_matches_torch():
    from geotrax_tpu.models.convert import _fold_conv_bn
    from geotrax_tpu.models.yolov8 import conv_block

    torch.manual_seed(0)
    block = TConv(8, 16, 3, 2).eval()
    _randomize_bn(block)
    sd = {f"x.{k}": v.numpy() for k, v in block.state_dict().items()}
    params = _fold_conv_bn(sd, "x")
    x = torch.randn(1, 8, 32, 32)
    with torch.no_grad():
        expected = block(x).permute(0, 2, 3, 1).numpy()
    got = np.asarray(conv_block(jax.tree.map(jnp.asarray, params), _to_jax_input(x), stride=2))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_c2f_block_matches_torch():
    from geotrax_tpu.models.convert import _c2f_params
    from geotrax_tpu.models.yolov8 import c2f_block

    torch.manual_seed(1)
    block = TC2f(16, 24, n=2, shortcut=True).eval()
    _randomize_bn(block)
    sd = {f"m.{k}": v.numpy() for k, v in block.state_dict().items()}
    params = _c2f_params(sd, "m")
    x = torch.randn(1, 16, 16, 16)
    with torch.no_grad():
        expected = block(x).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        c2f_block(jax.tree.map(jnp.asarray, params), _to_jax_input(x), n=2, shortcut=True)
    )
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_sppf_block_matches_torch():
    from geotrax_tpu.models.convert import _fold_conv_bn
    from geotrax_tpu.models.yolov8 import sppf_block

    torch.manual_seed(2)
    block = TSPPF(32, 32).eval()
    _randomize_bn(block)
    sd = {f"s.{k}": v.numpy() for k, v in block.state_dict().items()}
    params = {
        "cv1": _fold_conv_bn(sd, "s.cv1"),
        "cv2": _fold_conv_bn(sd, "s.cv2"),
    }
    x = torch.randn(1, 32, 12, 12)
    with torch.no_grad():
        expected = block(x).permute(0, 2, 3, 1).numpy()
    got = np.asarray(sppf_block(jax.tree.map(jnp.asarray, params), _to_jax_input(x)))
    np.testing.assert_allclose(got, expected, atol=2e-5)


# ---------------------------------------------------------------- full model
@pytest.mark.slow
@pytest.mark.parametrize("variant", ["n", "s"])
def test_forward_shapes(variant):
    spec = ModelSpec(variant=variant, nc=4)
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    boxes, probs = forward(params, x, spec)
    n_anchors = (160 // 8) ** 2 + (160 // 16) ** 2 + (160 // 32) ** 2
    assert boxes.shape == (1, n_anchors, 4)
    assert probs.shape == (1, n_anchors, 4)
    assert bool(jnp.all(probs >= 0)) and bool(jnp.all(probs <= 1))


@pytest.mark.slow
def test_forward_shapes_p2():
    """yolov8-p2 (reference train.sh model matrix yolov8X[-p2]): 4-scale head
    at strides (4,8,16,32), Detect at layer 28."""
    spec = ModelSpec(variant="n", nc=4, p2=True)
    assert spec.head_index == 28 and spec.strides == (4, 8, 16, 32)
    params = init_params(jax.random.PRNGKey(0), spec)
    assert "28" in params["layers"] and "22" in params["layers"]  # 22 = conv
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    boxes, probs = forward(params, x, spec)
    n_anchors = sum((160 // s) ** 2 for s in (4, 8, 16, 32))
    assert boxes.shape == (1, n_anchors, 4)
    assert probs.shape == (1, n_anchors, 4)
    assert bool(jnp.all(probs >= 0)) and bool(jnp.all(probs <= 1))


@pytest.mark.slow
def test_p2_export_convert_roundtrip():
    """export_ultralytics_state_dict (P2 layout, head at model.28) feeds back
    through infer_spec + convert_ultralytics bit-exactly."""
    from geotrax_tpu.models.convert import (
        convert_ultralytics,
        export_ultralytics_state_dict,
        infer_spec,
    )

    spec = ModelSpec(variant="n", nc=4, p2=True)
    params = init_params(jax.random.PRNGKey(1), spec)
    sd = {k: np.asarray(v) for k, v in export_ultralytics_state_dict(params, spec).items()}
    spec2 = infer_spec(sd)
    assert spec2.p2 and spec2.variant == "n" and spec2.nc == 4
    params2, _ = convert_ultralytics(sd, spec2)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 96, 96, 3)), jnp.float32)
    b1, p1 = forward(params, x, spec)
    b2, p2_ = forward(params2, x, spec2)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2_), rtol=1e-4, atol=1e-4)


def test_make_anchors():
    anchors, strides = make_anchors([(4, 4), (2, 2)], (8, 16))
    assert anchors.shape == (20, 2)
    np.testing.assert_allclose(np.asarray(anchors[0]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(strides[:16]), 8.0)
    np.testing.assert_allclose(np.asarray(strides[16:]), 16.0)


def test_infer_spec_from_state_dict():
    sd = {
        "model.0.conv.weight": np.zeros((32, 3, 3, 3)),   # s: 64*0.5
        "model.22.cv3.0.2.weight": np.zeros((4, 128, 1, 1)),
        "model.22.cv2.0.2.weight": np.zeros((64, 64, 1, 1)),
    }
    spec = infer_spec(sd)
    assert spec.variant == "s" and spec.nc == 4 and spec.reg_max == 16


# ---------------------------------------------------------------- letterbox
def test_letterbox_shape_4k():
    # 4K at imgsz 1920 with rect/auto padding -> 1088x1920 (stride 32)
    out_h, out_w, r, top, left = letterbox_shape(2160, 3840, 1920)
    assert (out_h, out_w) == (1088, 1920)
    assert r == pytest.approx(0.5)
    assert top == 4 and left == 0


def test_letterbox_and_unletterbox_roundtrip():
    out_h, out_w, r, top, left = letterbox_shape(100, 200, 192)
    img = jnp.zeros((100, 200, 3), jnp.uint8)
    new_h, new_w = round(100 * r), round(200 * r)
    canvas = letterbox(img, out_h, out_w, new_h, new_w, top, left)
    assert canvas.shape == (out_h, out_w, 3)
    # padding region carries the 114 gray
    assert float(canvas[0, 0, 0]) == pytest.approx(114 / 255, abs=1e-3) or top == 0

    boxes = jnp.array([[out_w / 2, out_h / 2, 10.0, 20.0]])
    back = unletterbox_boxes(boxes, r, top, left)
    assert back.shape == (1, 4)
    np.testing.assert_allclose(np.asarray(back[0, 2:]), [10 / r, 20 / r], rtol=1e-5)


def test_full_convert_roundtrip_torch_model():
    """Build a small torch 'ultralytics-layout' model covering the backbone
    plan for variant n, convert, and verify the JAX feature pyramid matches."""
    from geotrax_tpu.models.yolov8 import backbone_plan, forward_features

    spec = ModelSpec(variant="n", nc=2)
    plan = backbone_plan(spec)
    w = spec.width
    cin_map = {
        0: 3, 1: w(64), 2: w(128), 3: w(128), 4: w(256), 5: w(256), 6: w(512),
        7: w(512), 8: w(1024), 9: w(1024),
        12: w(1024) + w(512), 15: w(512) + w(256), 16: w(256),
        18: w(256) + w(512), 19: w(512), 21: w(512) + w(1024),
    }
    torch.manual_seed(3)
    tmods = {}
    for i, (kind, args) in plan.items():
        if kind == "conv":
            tmods[i] = TConv(cin_map[i], args["cout"], 3, args["stride"])
        elif kind == "c2f":
            tmods[i] = TC2f(cin_map[i], args["cout"], args["n"], args["shortcut"])
        else:
            tmods[i] = TSPPF(cin_map[i], args["cout"])
        tmods[i] = tmods[i].eval()
        _randomize_bn(tmods[i])

    sd = {}
    for i, mod in tmods.items():
        for k, v in mod.state_dict().items():
            sd[f"model.{i}.{k}"] = v.numpy()
    # minimal detect head entries so the converter has them (not compared here)
    c2 = max(16, w(256) // 4, 64)
    c3 = max(w(256), 2)
    ch = [w(256), w(512), w(1024)]
    head = {}
    for k, c in enumerate(ch):
        for branch, cb, co in (("cv2", c2, 64), ("cv3", c3, 2)):
            b0 = TConv(c, cb, 3).eval(); _randomize_bn(b0)
            b1 = TConv(cb, cb, 3).eval(); _randomize_bn(b1)
            for kk, v in b0.state_dict().items():
                sd[f"model.22.{branch}.{k}.0.{kk}"] = v.numpy()
            for kk, v in b1.state_dict().items():
                sd[f"model.22.{branch}.{k}.1.{kk}"] = v.numpy()
            sd[f"model.22.{branch}.{k}.2.weight"] = np.random.default_rng(k).normal(
                size=(co, cb, 1, 1)).astype(np.float32)
            sd[f"model.22.{branch}.{k}.2.bias"] = np.zeros(co, np.float32)
    sd.update(head)

    params, spec2 = convert_ultralytics(sd, spec)
    x = torch.randn(1, 3, 64, 64)

    # torch forward of the same graph
    with torch.no_grad():
        t = tmods[0](x); t = tmods[1](t); t = tmods[2](t); t = tmods[3](t)
        p3 = tmods[4](t); t = tmods[5](p3); p4 = tmods[6](t)
        t = tmods[7](p4); t = tmods[8](t); p5 = tmods[9](t)
        up = nn.Upsample(scale_factor=2, mode="nearest")
        n12 = tmods[12](torch.cat([up(p5), p4], 1))
        n15 = tmods[15](torch.cat([up(n12), p3], 1))
        n18 = tmods[18](torch.cat([tmods[16](n15), n12], 1))
        n21 = tmods[21](torch.cat([tmods[19](n18), p5], 1))
        expected = [f.permute(0, 2, 3, 1).numpy() for f in (n15, n18, n21)]

    got = forward_features(jax.tree.map(jnp.asarray, params), _to_jax_input(x), spec)
    for g, e in zip(got, expected):
        np.testing.assert_allclose(np.asarray(g), e, atol=5e-4)


def test_npz_save_load_roundtrip(tmp_path):
    """save_npz -> load_model must reproduce the forward exactly (the layers
    dict is digit-keyed with gaps and must NOT be restored as a list)."""
    from geotrax_tpu.models.convert import load_model, save_npz

    spec = ModelSpec(variant="n", nc=4)
    params = init_params(jax.random.PRNGKey(1), spec)
    path = tmp_path / "m.npz"
    save_npz(path, params, class_names={0: "car"}, variant="n", nc=4, reg_max=16)
    params2, spec2, names = load_model(path)
    assert spec2 == spec
    assert names == {0: "car"}
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 96, 96, 3)), jnp.float32)
    b1, p1 = forward(params, x, spec)
    b2, p2 = forward(jax.tree.map(jnp.asarray, params2), x, spec2)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_stem_s2d_exactness():
    """The space-to-depth stem must equal the plain strided conv to float
    rounding."""
    from geotrax_tpu.models.yolov8 import conv_block, stem_conv_s2d

    rng = np.random.default_rng(7)
    p = {
        "w": jnp.asarray(rng.normal(scale=0.1, size=(3, 3, 3, 16)), jnp.float32),
        "b": jnp.asarray(rng.normal(size=(16,)), jnp.float32),
    }
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 3)), jnp.float32)
    ref = conv_block(p, x, stride=2)
    got = stem_conv_s2d(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
