"""Golden checkpoint-parity test: a torch replica of the reference DAnA
modules (exact module names and math of
/root/reference/lib/model/framework/dana.py) is exported as a
reference-style state_dict, converted through utils/torch_import, and our
forward must reproduce the torch forward numerically.

This is the load path of the released `cisa_coco_ft30` checkpoint: if
these pass, a real reference checkpoint converts correctly (same keys,
same layouts, same math).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dana_tpu.models import dana  # noqa: E402
from dana_tpu.models import rpn as rpn_lib  # noqa: E402
from dana_tpu.models.layers import to_jnp  # noqa: E402
from dana_tpu.utils.torch_import import convert_dana_state_dict  # noqa: E402

from test_backbone import TorchBottleneck, _randomize_bn  # noqa: E402

D = 1024
REDUCE = 64     # small reduce dim for the fast variant; same math as 256


def _make_resnet50_base_top(gen, tame=True):
    """torch conv1..layer3 (RCNN_base) + layer4 (RCNN_top), real resnet50
    block counts so the converted tree matches arch='resnet50'.

    tame=False leaves conv weights at init scale and gives the BNs
    Caffe-magnitude running stats (the released resnet50_caffe.pth has
    |mean| up to ~hundreds and var up to ~1e4) — the full-width parity
    variant runs with realistic numerics."""
    mods = {}
    mods['conv1'] = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
    mods['bn1'] = nn.BatchNorm2d(64)
    inplanes = 64
    for li, (planes, blocks) in enumerate(
            zip([64, 128, 256, 512], [3, 4, 6, 3])):
        stride = 1 if li == 0 else 2
        seq = []
        for b in range(blocks):
            s = stride if b == 0 else 1
            down = None
            if s != 1 or inplanes != planes * 4:
                down = nn.Sequential(
                    nn.Conv2d(inplanes, planes * 4, 1, s, bias=False),
                    nn.BatchNorm2d(planes * 4))
            seq.append(TorchBottleneck(inplanes, planes, s, down))
            inplanes = planes * 4
        mods[f'layer{li + 1}'] = nn.Sequential(*seq)
    model = nn.Module()
    for k, v in mods.items():
        setattr(model, k, v)
    model.relu = nn.ReLU()
    model.maxpool = nn.MaxPool2d(3, 2, padding=0, ceil_mode=True)
    with torch.no_grad():
        _randomize_bn(model, gen)
        if tame:
            for m in model.modules():
                if isinstance(m, nn.Conv2d):
                    m.weight.data.mul_(0.5)   # tame activations for parity
        else:
            for m in model.modules():
                if isinstance(m, nn.BatchNorm2d):
                    # Caffe-scale stats: large means/vars like the real
                    # resnet50_caffe.pth (normalizes activations back down)
                    c = m.running_mean.numel()
                    m.running_mean.copy_(torch.randn(c, generator=gen) * 30)
                    m.running_var.copy_(
                        torch.rand(c, generator=gen) * 400 + 1.0)
    model.eval()
    return model


class TorchDanaHeads(nn.Module):
    """The reference DAnA attention/head modules with original names."""

    def __init__(self, gen, reduce=REDUCE):
        super().__init__()
        self.reduce = reduce
        self.rpn_adapt_q_layer = nn.Linear(D, reduce)
        self.rpn_adapt_k_layer = nn.Linear(D, reduce)
        self.rpn_unary_layer = nn.Linear(D, 1)
        self.rcnn_adapt_q_layer = nn.Linear(D, reduce)
        self.rcnn_adapt_k_layer = nn.Linear(D, reduce)
        self.rcnn_unary_layer = nn.Linear(D, 1)
        self.rcnn_transform_layer = nn.Linear(2 * D, 64)
        self.RCNN_bbox_pred = nn.Linear(2048, 4)
        self.output_score_layer = nn.Module()
        self.output_score_layer.linear1 = nn.Linear(64 * 49, 1024)
        self.output_score_layer.linear2 = nn.Linear(1024, 2)
        rpn = nn.Module()
        rpn.RPN_Conv = nn.Conv2d(2 * D, 512, 3, 1, 1, bias=True)
        rpn.RPN_cls_score = nn.Conv2d(512, 24, 1, 1, 0)
        rpn.RPN_bbox_pred = nn.Conv2d(512, 48, 1, 1, 0)
        self.RCNN_rpn = rpn
        for m in self.modules():
            if isinstance(m, (nn.Linear, nn.Conv2d)):
                nn.init.normal_(m.weight, std=0.02, generator=gen)
                if m.bias is not None:
                    nn.init.normal_(m.bias, std=0.02, generator=gen)


def _pe(max_len):
    pe = torch.zeros(max_len, D)
    position = torch.arange(0., max_len).unsqueeze(1)
    div = torch.exp(torch.arange(0., D, 2) * -(math.log(10000.0) / D))
    pe[:, 0::2] = torch.sin(position * div)
    pe[:, 1::2] = torch.cos(position * div)
    return pe.unsqueeze(0)


def _torch_cisa(q_mat, s_mats, q_layer, k_layer, unary_layer, gamma=0.1,
                reduce=REDUCE):
    """dana.py:118-151 (no BA block, PE applied by caller)."""
    q = q_layer(q_mat)
    q = q - q.mean(1, keepdim=True)
    feats = []
    for s in s_mats:
        k = k_layer(s)
        k = k - k.mean(1, keepdim=True)
        w = torch.bmm(q, k.transpose(1, 2)) / math.sqrt(reduce)
        w = F.softmax(w, dim=2)
        u = F.softmax(unary_layer(s), dim=1)
        w = w + gamma * u.transpose(1, 2)
        feats.append(torch.bmm(w, s))
    return torch.stack(feats, 0).mean(0)


# Two parity regimes: the fast reduced replica, and production widths
# (reduce_dim 256) with UNTAMED Caffe-scale BN stats, exported through the
# exact {'model','epoch','pooling_mode'} wrapper the reference train.py
# writes (train.py:183-189) and ingested by our real checkpoint loader —
# the full last mile of the cisa_coco_ft30 import path.
@pytest.fixture(scope='module',
                params=[dict(reduce=64, tame=True, wrapper=False),
                        dict(reduce=256, tame=False, wrapper=True)],
                ids=['reduced-tamed', 'fullwidth-caffe-ckpt'])
def setup(request, tmp_path_factory):
    p = request.param
    gen = torch.Generator().manual_seed(7)
    base = _make_resnet50_base_top(gen, tame=p['tame'])
    heads = TorchDanaHeads(gen, reduce=p['reduce'])

    # reference-style checkpoint keys
    sd = {}
    rename = {'conv1': 'RCNN_base.0', 'bn1': 'RCNN_base.1',
              'layer1': 'RCNN_base.4', 'layer2': 'RCNN_base.5',
              'layer3': 'RCNN_base.6', 'layer4': 'RCNN_top.0'}
    for k, v in base.state_dict().items():
        root = k.split('.')[0]
        sd[rename[root] + k[len(root):]] = v
    sd.update(heads.state_dict())

    if p['wrapper']:
        from dana_tpu.utils import checkpoint as ckpt_lib
        path = str(tmp_path_factory.mktemp('ck') / 'model_4_299.pth')
        torch.save({'model': sd, 'epoch': 4, 'pooling_mode': 'align',
                    'optimizer': {}}, path)
        payload = ckpt_lib.load_checkpoint(path)
        assert payload['epoch'] == 4
        assert payload['pooling_mode'] == 'align'
        params = to_jnp(payload['model'])
    else:
        params = to_jnp(convert_dana_state_dict(
            {k: v.numpy() for k, v in sd.items()}))

    config = dana.DanaConfig(
        n_way=2, n_shot=2, rpn_reduce_dim=p['reduce'],
        rcnn_reduce_dim=p['reduce'], use_pallas_attention=False)
    gen2 = torch.Generator().manual_seed(11)
    query = torch.randn(1, 3, 64, 80, generator=gen2)
    supports = torch.randn(2, 3, 320, 320, generator=gen2)
    return base, heads, params, config, query, supports


def test_correlation_and_rpn_parity(setup):
    base, heads, params, config, query, supports = setup
    with torch.no_grad():
        base_feat = base.layer3(base.layer2(base.layer1(
            base.maxpool(base.relu(base.bn1(base.conv1(query)))))))
        sup_feat = base.layer3(base.layer2(base.layer1(
            base.maxpool(base.relu(base.bn1(base.conv1(supports)))))))
        bsz, _, fh, fw = base_feat.shape
        support_mat = sup_feat.view(2, 1, D, -1).transpose(2, 3)  # [shot,1,400,D]
        query_mat = base_feat.view(1, D, -1).transpose(1, 2)      # [1,hw,D]
        pe400 = _pe(400)
        s_mats = [support_mat[i] + pe400 for i in range(2)]
        dense = _torch_cisa(query_mat, s_mats, heads.rpn_adapt_q_layer,
                            heads.rpn_adapt_k_layer, heads.rpn_unary_layer,
                            reduce=heads.reduce)
        dense = dense.transpose(1, 2).view(1, D, fh, fw)
        corr = torch.cat([base_feat, dense], 1)
        rpn_conv = F.relu(heads.RCNN_rpn.RPN_Conv(corr))
        cls_raw = heads.RCNN_rpn.RPN_cls_score(rpn_conv)
        cls_reshape = cls_raw.view(1, 2, 12 * fh, fw)
        prob = F.softmax(cls_reshape, 1).view(1, 24, fh, fw)
        fg_t = prob[:, 12:].permute(0, 2, 3, 1).reshape(1, -1)
        deltas_t = heads.RCNN_rpn.RPN_bbox_pred(rpn_conv) \
            .permute(0, 2, 3, 1).reshape(1, -1, 4)

    q_j = jnp.asarray(query.permute(0, 2, 3, 1).numpy())
    s_j = jnp.asarray(supports.permute(0, 2, 3, 1).numpy())[None]
    base_j = dana.backbone_base(params, config, q_j)
    sup_j, _ = dana.extract_support_feats(params, config, s_j)
    rpn_pe = jnp.asarray(dana.positional_encoding(400, D))
    corr_j = dana.rpn_attention(params, config, base_j, sup_j, rpn_pe)
    np.testing.assert_allclose(
        np.asarray(corr_j), corr.permute(0, 2, 3, 1).numpy(),
        rtol=2e-3, atol=2e-3)

    logits, probs_fg, deltas = rpn_lib.rpn_forward(
        corr_j, params['RCNN_rpn'], 12)
    np.testing.assert_allclose(np.asarray(probs_fg), fg_t.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(deltas), deltas_t.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_rcnn_head_parity(setup):
    base, heads, params, config, query, supports = setup
    gen = torch.Generator().manual_seed(13)
    n_roi = 4
    pooled_t = torch.randn(n_roi, D, 7, 7, generator=gen)
    sup_pooled_t = torch.randn(1, 2, D, 7, 7, generator=gen)

    with torch.no_grad():
        # bbox branch (dana.py:246, _head_to_tail:385-387)
        tail = base.layer4(pooled_t).mean(3).mean(2)
        bbox_t = heads.RCNN_bbox_pred(tail)
        # cls branch (dana.py:248-306)
        pe49 = _pe(49)
        target = sup_pooled_t.view(1, 2, D, -1).transpose(2, 3)
        target = target.repeat(n_roi, 1, 1, 1)
        q_mat = pooled_t.view(n_roi, D, -1).transpose(1, 2) + pe49
        s_mats = [target[:, i] + pe49 for i in range(2)]
        dense = _torch_cisa(q_mat, s_mats, heads.rcnn_adapt_q_layer,
                            heads.rcnn_adapt_k_layer,
                            heads.rcnn_unary_layer, reduce=heads.reduce)
        corr = torch.cat([q_mat, dense], 2)
        corr = heads.rcnn_transform_layer(corr)
        x = F.relu(heads.output_score_layer.linear1(
            corr.view(n_roi, -1)))
        score_t = heads.output_score_layer.linear2(x)

    pooled_j = jnp.asarray(pooled_t.permute(0, 2, 3, 1).numpy())[None]
    sup_j = jnp.asarray(sup_pooled_t.permute(0, 1, 3, 4, 2).numpy())
    pe_j = jnp.asarray(dana.positional_encoding(49, D))
    bbox_j, prob_j, score_j = dana.rcnn_head(params, config, pooled_j,
                                             sup_j, pe_j)
    np.testing.assert_allclose(np.asarray(bbox_j[0]), bbox_t.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(score_j[0]), score_t.numpy(),
                               rtol=2e-3, atol=2e-3)
