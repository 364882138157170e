"""RT-DETR ultralytics-checkpoint conversion: torch-oracle parity.

The torch side rebuilds the ultralytics rtdetr-l graph (HGNetv2 backbone,
AIFI/CCFM hybrid encoder, deformable decoder) with ultralytics' module and
state-dict naming at reduced dimensions; the converter
(models/convert.py:convert_rtdetr_ultralytics) maps its state dict onto
models/rtdetr_ul.py and the outputs must agree block-by-block and
end-to-end (same pattern as tests/test_yolov8.py for the YOLO converter,
VERDICT round-1 item 4)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

from geotrax_tpu.models import rtdetr_ul  # noqa: E402
from geotrax_tpu.models.convert import convert_rtdetr_ultralytics  # noqa: E402
from geotrax_tpu.models.rtdetr_ul import ULSpec  # noqa: E402

torch.manual_seed(0)


# ------------------------------------------------------------- torch oracle
class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True):
        super().__init__()
        p = k // 2 if p is None else p
        self.conv = nn.Conv2d(c1, c2, k, s, p, groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)
        self.act = act if isinstance(act, nn.Module) else (
            nn.SiLU() if act is True else nn.Identity()
        )

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class DWConv(Conv):
    def __init__(self, c1, c2, k=1, s=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class LightConv(nn.Module):
    def __init__(self, c1, c2, k=1, act=nn.ReLU()):
        super().__init__()
        self.conv1 = Conv(c1, c2, 1, act=False)
        self.conv2 = DWConv(c2, c2, k, act=act)

    def forward(self, x):
        return self.conv2(self.conv1(x))


class HGStem(nn.Module):
    def __init__(self, c1, cm, c2):
        super().__init__()
        self.stem1 = Conv(c1, cm, 3, 2, act=nn.ReLU())
        self.stem2a = Conv(cm, cm // 2, 2, 1, 0, act=nn.ReLU())
        self.stem2b = Conv(cm // 2, cm, 2, 1, 0, act=nn.ReLU())
        self.stem3 = Conv(cm * 2, cm, 3, 2, act=nn.ReLU())
        self.stem4 = Conv(cm, c2, 1, 1, act=nn.ReLU())
        self.pool = nn.MaxPool2d(2, 1, 0, ceil_mode=True)

    def forward(self, x):
        x = self.stem1(x)
        x = F.pad(x, [0, 1, 0, 1])
        x2 = self.stem2a(x)
        x2 = F.pad(x2, [0, 1, 0, 1])
        x2 = self.stem2b(x2)
        x1 = self.pool(x)
        x = torch.cat([x1, x2], dim=1)
        return self.stem4(self.stem3(x))


class HGBlock(nn.Module):
    def __init__(self, c1, cm, c2, k=3, n=6, lightconv=False, shortcut=False,
                 act=nn.ReLU()):
        super().__init__()
        block = LightConv if lightconv else Conv
        self.m = nn.ModuleList(
            block(c1 if i == 0 else cm, cm, k, act=act) for i in range(n)
        )
        self.sc = Conv(c1 + n * cm, c2 // 2, 1, 1, act=act)
        self.ec = Conv(c2 // 2, c2, 1, 1, act=act)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = [x]
        y.extend(m(y[-1]) for m in self.m)
        y = self.ec(self.sc(torch.cat(y, 1)))
        return y + x if self.add else y


class AIFI(nn.Module):
    def __init__(self, c1, cm=1024, num_heads=8):
        super().__init__()
        self.ma = nn.MultiheadAttention(c1, num_heads, batch_first=True)
        self.fc1 = nn.Linear(c1, cm)
        self.fc2 = nn.Linear(cm, c1)
        self.norm1 = nn.LayerNorm(c1)
        self.norm2 = nn.LayerNorm(c1)
        self.num_heads = num_heads

    @staticmethod
    def pos_embed(w, h, dim, temperature=10000.0):
        grid_w, grid_h = torch.meshgrid(
            torch.arange(w, dtype=torch.float32),
            torch.arange(h, dtype=torch.float32), indexing="ij",
        )
        pos_dim = dim // 4
        omega = 1.0 / (temperature ** (torch.arange(pos_dim, dtype=torch.float32) / pos_dim))
        out_w = grid_w.flatten()[..., None] @ omega[None]
        out_h = grid_h.flatten()[..., None] @ omega[None]
        return torch.cat(
            [torch.sin(out_w), torch.cos(out_w), torch.sin(out_h), torch.cos(out_h)], 1
        )[None]

    def forward(self, x):
        c, h, w = x.shape[1:]
        pos = self.pos_embed(w, h, c)
        src = x.flatten(2).permute(0, 2, 1)
        q = k = src + pos
        src2 = self.ma(q, k, value=src)[0]
        src = self.norm1(src + src2)
        src2 = self.fc2(F.gelu(self.fc1(src)))
        src = self.norm2(src + src2)
        return src.permute(0, 2, 1).view(-1, c, h, w).contiguous()


class RepConv(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.conv1 = Conv(c1, c2, 3, 1, act=False)
        self.conv2 = Conv(c1, c2, 1, 1, act=False)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.conv1(x) + self.conv2(x))


class RepC3(nn.Module):
    def __init__(self, c1, c2, n=3):
        super().__init__()
        self.cv1 = Conv(c1, c2, 1, 1)
        self.cv2 = Conv(c1, c2, 1, 1)
        self.m = nn.Sequential(*[RepConv(c2, c2) for _ in range(n)])

    def forward(self, x):
        return self.m(self.cv1(x)) + self.cv2(x)


class MSDeformAttn(nn.Module):
    def __init__(self, d_model, n_levels=3, n_heads=8, n_points=4):
        super().__init__()
        self.nh, self.nl, self.npts = n_heads, n_levels, n_points
        self.sampling_offsets = nn.Linear(d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = nn.Linear(d_model, n_heads * n_levels * n_points)
        self.value_proj = nn.Linear(d_model, d_model)
        self.output_proj = nn.Linear(d_model, d_model)

    def forward(self, query, refer_bbox, value, value_shapes):
        bs, len_q = query.shape[:2]
        len_v = value.shape[1]
        v = self.value_proj(value).view(bs, len_v, self.nh, -1)
        off = self.sampling_offsets(query).view(
            bs, len_q, self.nh, self.nl, self.npts, 2
        )
        aw = self.attention_weights(query).view(
            bs, len_q, self.nh, self.nl * self.npts
        )
        aw = F.softmax(aw, -1).view(bs, len_q, self.nh, self.nl, self.npts)
        add = off / self.npts * refer_bbox[:, :, None, :, None, 2:] * 0.5
        loc = refer_bbox[:, :, None, :, None, :2] + add
        # multi_scale_deformable_attn_pytorch
        value_list = v.split([h * w for h, w in value_shapes], dim=1)
        out = []
        for li, (h, w) in enumerate(value_shapes):
            vl = value_list[li].flatten(2).transpose(1, 2).reshape(
                bs * self.nh, -1, h, w
            )
            grid = loc[:, :, :, li] * 2 - 1
            grid = grid.transpose(1, 2).flatten(0, 1)  # (bs*nh, len_q, npts, 2)
            out.append(F.grid_sample(vl, grid, mode="bilinear",
                                     padding_mode="zeros", align_corners=False))
        out = torch.stack(out, dim=-2).flatten(-2)  # (bs*nh, dh, len_q, nl*npts)
        aw2 = aw.transpose(1, 2).reshape(bs * self.nh, 1, len_q, self.nl * self.npts)
        y = (out * aw2).sum(-1).view(bs, self.nh * v.shape[-1], len_q)
        return self.output_proj(y.transpose(1, 2))


class MLP(nn.Module):
    def __init__(self, cin, ch, cout, num_layers):
        super().__init__()
        dims = [cin] + [ch] * (num_layers - 1)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims, dims[1:] + [cout])
        )

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = F.relu(layer(x)) if i < len(self.layers) - 1 else layer(x)
        return x


class DeformableTransformerDecoderLayer(nn.Module):
    def __init__(self, d_model, n_heads, d_ffn, n_levels, n_points):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d_model, n_heads)
        self.norm1 = nn.LayerNorm(d_model)
        self.cross_attn = MSDeformAttn(d_model, n_levels, n_heads, n_points)
        self.norm2 = nn.LayerNorm(d_model)
        self.linear1 = nn.Linear(d_model, d_ffn)
        self.linear2 = nn.Linear(d_ffn, d_model)
        self.norm3 = nn.LayerNorm(d_model)

    def forward(self, embed, refer_bbox, feats, shapes, query_pos):
        q = k = embed + query_pos
        tgt = self.self_attn(q.transpose(0, 1), k.transpose(0, 1),
                             embed.transpose(0, 1))[0].transpose(0, 1)
        embed = self.norm1(embed + tgt)
        tgt = self.cross_attn(embed + query_pos, refer_bbox.unsqueeze(2),
                              feats, shapes)
        embed = self.norm2(embed + tgt)
        return self.norm3(embed + self.linear2(F.relu(self.linear1(embed))))


class DeformableTransformerDecoder(nn.Module):
    """ultralytics naming: a .layers ModuleList of decoder layers."""

    def __init__(self, hd, nh, d_ffn, nl, ndp, ndl):
        super().__init__()
        self.layers = nn.ModuleList(
            DeformableTransformerDecoderLayer(hd, nh, d_ffn, nl, ndp)
            for _ in range(ndl)
        )


def inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(eps) / (1 - x).clamp(eps))


class RTDETRDecoder(nn.Module):
    def __init__(self, nc, ch, hd, nq, ndp, nh, ndl, d_ffn):
        super().__init__()
        self.nc, self.hd, self.nq, self.ndl = nc, hd, nq, ndl
        self.input_proj = nn.ModuleList(
            nn.Sequential(nn.Conv2d(x, hd, 1, bias=False), nn.BatchNorm2d(hd))
            for x in ch
        )
        self.decoder = DeformableTransformerDecoder(hd, nh, d_ffn, len(ch), ndp, ndl)
        self.query_pos_head = MLP(4, 2 * hd, hd, 2)
        self.enc_output = nn.Sequential(nn.Linear(hd, hd), nn.LayerNorm(hd))
        self.enc_score_head = nn.Linear(hd, nc)
        self.enc_bbox_head = MLP(hd, hd, 4, 3)
        self.dec_score_head = nn.ModuleList(nn.Linear(hd, nc) for _ in range(ndl))
        self.dec_bbox_head = nn.ModuleList(MLP(hd, hd, 4, 3) for _ in range(ndl))

    @staticmethod
    def generate_anchors(shapes, grid_size=0.05, eps=1e-2):
        anchors = []
        for i, (h, w) in enumerate(shapes):
            gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                    torch.arange(w, dtype=torch.float32),
                                    indexing="ij")
            gxy = (torch.stack([gx, gy], -1).unsqueeze(0) + 0.5) / torch.tensor(
                [w, h], dtype=torch.float32
            )
            wh = torch.ones_like(gxy) * grid_size * (2.0 ** i)
            anchors.append(torch.cat([gxy, wh], -1).view(-1, h * w, 4))
        anchors = torch.cat(anchors, 1)
        valid = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdim=True)
        anchors = torch.log(anchors / (1 - anchors))
        anchors = anchors.masked_fill(~valid, float("inf"))
        return anchors, valid.float()

    def forward(self, feats_maps):
        proj = [p(f) for p, f in zip(self.input_proj, feats_maps)]
        shapes = [(f.shape[2], f.shape[3]) for f in proj]
        feats = torch.cat([f.flatten(2).permute(0, 2, 1) for f in proj], 1)
        anchors, valid_mask = self.generate_anchors(shapes)
        features = self.enc_output(valid_mask * feats)
        enc_scores = self.enc_score_head(features)
        topk_ind = torch.topk(enc_scores.max(-1).values, self.nq, dim=1).indices
        b_ind = torch.arange(feats.shape[0]).unsqueeze(-1).repeat(1, self.nq).view(-1)
        top_feats = features[b_ind, topk_ind.view(-1)].view(-1, self.nq, self.hd)
        top_anchors = anchors[:, topk_ind.view(-1)].view(-1, self.nq, 4)
        refer = self.enc_bbox_head(top_feats) + top_anchors
        embed = top_feats
        refer_bbox = refer.sigmoid()
        for i in range(self.ndl):
            qpos = self.query_pos_head(refer_bbox)
            embed = self.decoder.layers[i](embed, refer_bbox, feats2_global[0], shapes, qpos)
            bbox = self.dec_bbox_head[i](embed)
            refer_bbox = torch.sigmoid(bbox + inverse_sigmoid(refer_bbox))
        return refer_bbox, self.dec_score_head[self.ndl - 1](embed).sigmoid()


feats2_global = [None]  # the decoder's cross-attn reads the flattened values


class TinyRTDETR(nn.Module):
    """rtdetr-l graph at reduced dims with ultralytics layer indices."""

    def __init__(self, nc=4, hd=32, nh=4, ndp=2, ndl=2, d_ffn=64):
        super().__init__()
        act = nn.ReLU()
        layers = {
            "0": HGStem(3, 8, 12),
            "1": HGBlock(12, 12, 24, 3, 6, False, False, act),
            "2": DWConv(24, 24, 3, 2, act=False),
            "3": HGBlock(24, 16, 48, 3, 6, False, False, act),
            "4": DWConv(48, 48, 3, 2, act=False),
            "5": HGBlock(48, 24, 64, 5, 6, True, False, act),
            "6": HGBlock(64, 24, 64, 5, 6, True, True, act),
            "7": HGBlock(64, 24, 64, 5, 6, True, True, act),
            "8": DWConv(64, 64, 3, 2, act=False),
            "9": HGBlock(64, 32, 96, 5, 6, True, False, act),
            "10": Conv(96, hd, 1, act=False),
            "11": AIFI(hd, 2 * hd, nh),
            "12": Conv(hd, hd, 1),
            "14": Conv(64, hd, 1, act=False),
            "16": RepC3(2 * hd, hd, 3),
            "17": Conv(hd, hd, 1),
            "19": Conv(48, hd, 1, act=False),
            "21": RepC3(2 * hd, hd, 3),
            "22": Conv(hd, hd, 3, 2),
            "24": RepC3(2 * hd, hd, 3),
            "25": Conv(hd, hd, 3, 2),
            "27": RepC3(2 * hd, hd, 3),
            "28": RTDETRDecoder(nc, (hd, hd, hd), hd, 20, ndp, nh, ndl, d_ffn),
        }
        self.model = nn.ModuleDict(layers)

    def forward(self, x):
        m = self.model
        x = m["0"](x)
        x = m["1"](x)
        x = m["2"](x)
        p3 = m["3"](x)
        x = m["4"](p3)
        x = m["5"](x)
        x = m["6"](x)
        p4 = m["7"](x)
        x = m["8"](p4)
        p5 = m["9"](x)
        f5 = m["10"](p5)
        f5 = m["11"](f5)
        y5 = m["12"](f5)
        up = F.interpolate(y5, scale_factor=2, mode="nearest")
        f4 = m["14"](p4)
        x = m["16"](torch.cat([up, f4], 1))
        y4 = m["17"](x)
        up = F.interpolate(y4, scale_factor=2, mode="nearest")
        f3 = m["19"](p3)
        out3 = m["21"](torch.cat([up, f3], 1))
        x = m["22"](out3)
        out4 = m["24"](torch.cat([x, y4], 1))
        x = m["25"](out4)
        out5 = m["27"](torch.cat([x, y5], 1))
        proj = [p(f) for p, f in zip(m["28"].input_proj, (out3, out4, out5))]
        feats2_global[0] = torch.cat(
            [f.flatten(2).permute(0, 2, 1) for f in proj], 1
        )
        return m["28"]((out3, out4, out5))


TINY_SPEC = ULSpec(
    nc=4, hd=32, nq=20, ndl=2, nh=4, ndp=2, d_ffn=64,
    stages=(
        (12, 24, 3, False, False, 6),
        (16, 48, 3, False, False, 6),
        (24, 64, 5, True, False, 6),
        (24, 64, 5, True, True, 6),
        (24, 64, 5, True, True, 6),
        (32, 96, 5, True, False, 6),
    ),
    stem_cm=8, stem_c2=12,
)


@pytest.fixture(scope="module")
def tiny():
    torch.manual_seed(3)
    model = TinyRTDETR().eval()
    # non-trivial BN stats so folding is actually exercised
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.1, 0.1)
                mod.running_var.uniform_(0.8, 1.2)
    sd = {"model." + k: v.detach().numpy() for k, v in model.model.state_dict().items()}
    params, _ = convert_rtdetr_ultralytics(sd, TINY_SPEC)
    return model, params


def _to_jax(x_torch):
    return jnp.asarray(x_torch.permute(0, 2, 3, 1).numpy())


@pytest.mark.slow
def test_backbone_matches_torch(tiny):
    model, params = tiny
    x = torch.rand(1, 3, 64, 96)
    with torch.no_grad():
        m = model.model
        t = m["0"](x)
        t = m["1"](t)
        t = m["2"](t)
        p3 = m["3"](t)
        t4 = m["4"](p3)
        t4 = m["5"](t4)
        t4 = m["6"](t4)
        p4 = m["7"](t4)
        t5 = m["8"](p4)
        p5 = m["9"](t5)
    j3, j4, j5 = rtdetr_ul.backbone(params["backbone"], _to_jax(x), TINY_SPEC)
    np.testing.assert_allclose(np.asarray(j3), p3.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j5), p5.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_full_forward_matches_torch(tiny):
    model, params = tiny
    x = torch.rand(1, 3, 64, 96)
    with torch.no_grad():
        t_boxes, t_scores = model(x)
    j_boxes, j_probs = rtdetr_ul.forward(params, _to_jax(x), TINY_SPEC)
    scale = np.array([96, 64, 96, 64], np.float32)
    np.testing.assert_allclose(
        np.asarray(j_boxes) / scale, t_boxes.numpy(), atol=5e-4, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(j_probs), t_scores.numpy(), atol=5e-4, rtol=1e-2
    )


@pytest.mark.slow
def test_detector_loads_ultralytics_rtdetr_pt(tmp_path):
    """VERDICT item-4 'done' criterion: Detector('rtdetr-*.pt') works — a
    full rtdetr-l graph checkpoint (random weights) saved ultralytics-style
    loads through the converter and produces fixed-slot detections."""
    torch.manual_seed(7)
    model = TinyRTDETR(nc=4, hd=256, nh=8, ndp=4, ndl=6, d_ffn=1024)
    # re-dimension the backbone to the real rtdetr-l widths so the spec
    # inference path (stem width 32) engages
    act = nn.ReLU()
    model.model["0"] = HGStem(3, 32, 48)
    model.model["1"] = HGBlock(48, 48, 128, 3, 6, False, False, act)
    model.model["2"] = DWConv(128, 128, 3, 2, act=False)
    model.model["3"] = HGBlock(128, 96, 512, 3, 6, False, False, act)
    model.model["4"] = DWConv(512, 512, 3, 2, act=False)
    model.model["5"] = HGBlock(512, 192, 1024, 5, 6, True, False, act)
    model.model["6"] = HGBlock(1024, 192, 1024, 5, 6, True, True, act)
    model.model["7"] = HGBlock(1024, 192, 1024, 5, 6, True, True, act)
    model.model["8"] = DWConv(1024, 1024, 3, 2, act=False)
    model.model["9"] = HGBlock(1024, 384, 2048, 5, 6, True, False, act)
    model.model["10"] = Conv(2048, 256, 1, act=False)
    model.model["11"] = AIFI(256, 1024, 8)
    model.model["14"] = Conv(1024, 256, 1, act=False)
    model.model["16"] = RepC3(512, 256, 3)
    model.model["19"] = Conv(512, 256, 1, act=False)
    model.model["21"] = RepC3(512, 256, 3)
    model.model["24"] = RepC3(512, 256, 3)
    model.model["27"] = RepC3(512, 256, 3)
    model.model["28"] = RTDETRDecoder(4, (256, 256, 256), 256, 300, 4, 8, 6, 1024)
    model.names = {0: "car", 1: "bus", 2: "truck", 3: "motorcycle"}
    path = tmp_path / "rtdetr-l-test.pt"
    torch.save({"model": model.eval()}, path)

    from geotrax_tpu.models.detector import Detector

    det = Detector(path, {"imgsz": 320, "conf": 0.0, "max_det": 64})
    assert det.is_rtdetr and det.is_ul_rtdetr
    assert det.spec.nc == 4 and det.spec.ndl == 6
    frame = np.random.default_rng(0).integers(0, 255, (240, 320, 3), np.uint8)
    out = det(frame)
    assert out["boxes_xywh"].shape == (64, 4)
    assert np.asarray(out["scores"]).max() <= 1.0
    assert np.isfinite(np.asarray(out["boxes_xywh"])).all()
