"""Import reference PyTorch checkpoints into dana_tpu param trees.

Handles both raw backbone checkpoints (resnet50_caffe.pth) and full
framework checkpoints ({'model': state_dict, 'epoch', 'optimizer',
'pooling_mode'} saved by train.py:183-189, e.g. the released
cisa_coco_ft30).  Layout conversion: conv OIHW -> HWIO, linear
[out, in] -> [in, out].  torch (CPU build) is only imported lazily here —
the rest of the framework never touches it.

Key mapping (reference dana.py:344-346):
  RCNN_base.0 -> backbone.conv1     RCNN_base.4 -> backbone.layer1
  RCNN_base.1 -> backbone.bn1       RCNN_base.5 -> backbone.layer2
  RCNN_top.0  -> backbone.layer4    RCNN_base.6 -> backbone.layer3
Everything else keeps its torch module name verbatim.
"""

from __future__ import annotations

import numpy as np

_BASE_MAP = {
    'RCNN_base.0': 'backbone.conv1',
    'RCNN_base.1': 'backbone.bn1',
    'RCNN_base.4': 'backbone.layer1',
    'RCNN_base.5': 'backbone.layer2',
    'RCNN_base.6': 'backbone.layer3',
    'RCNN_top.0': 'backbone.layer4',
}


def load_state_dict(path: str, allow_pickle: bool = False):
    """Load a .pth file -> (flat {name: np.ndarray} state dict, extra dict).

    `extra` carries the non-weight payload of full train.py checkpoints
    (epoch / optimizer / pooling_mode).  Tries the safe weights_only
    loader first; third-party .pth files that need full unpickling require
    explicit opt-in via allow_pickle=True.
    """
    import torch
    try:
        ckpt = torch.load(path, map_location='cpu', weights_only=True)
    except Exception:
        if not allow_pickle:
            raise
        ckpt = torch.load(path, map_location='cpu', weights_only=False)
    extra = {}
    if isinstance(ckpt, dict) and 'model' in ckpt:
        extra = {k: v for k, v in ckpt.items() if k != 'model'}
        ckpt = ckpt['model']
    state = {k: np.asarray(v.detach().numpy() if hasattr(v, 'detach') else v)
             for k, v in ckpt.items()}
    return state, extra


# FGN's RCNN_cls_score consumes a FLATTENED conv feature map
# (fgn.py:165: cls_feat.view(n, -1) on [n, 128, 3, 3]; Linear(1152, 2)
# at fgn.py:218).  torch flattens NCHW (c, h, w); our head flattens the
# NHWC map (h, w, c) — the linear's input dim must be permuted or an
# imported .pth silently mis-maps all 1152 inputs (caught by
# tests/test_reference_ab.py::test_fgn_full_forward_matches_reference).
_FGN_CLS_IN = (128, 3, 3)


def _convert_leaf(name: str, v: np.ndarray) -> np.ndarray:
    if v.ndim == 4:                      # conv OIHW -> HWIO
        return np.ascontiguousarray(v.transpose(2, 3, 1, 0)).astype(np.float32)
    if v.ndim == 2 and name.endswith('weight'):   # linear [out,in] -> [in,out]
        if name == 'RCNN_cls_score.weight' and \
                v.shape[1] == int(np.prod(_FGN_CLS_IN)):
            c, h, w = _FGN_CLS_IN        # (c,h,w) flat -> (h,w,c) flat
            v = v.reshape(-1, c, h, w).transpose(0, 2, 3, 1) \
                 .reshape(v.shape[0], -1)
        return np.ascontiguousarray(v.T).astype(np.float32)
    return v.astype(np.float32) if v.dtype.kind == 'f' else v


def convert_dana_state_dict(state: dict) -> dict:
    """Flat torch DAnA state dict -> nested dana_tpu param tree."""
    out = {}
    for key, v in state.items():
        if key.endswith('num_batches_tracked') or key.startswith('pe'):
            continue
        mapped = key
        for src, dst in _BASE_MAP.items():
            if key.startswith(src + '.'):
                mapped = dst + key[len(src):]
                break
        parts = mapped.split('.')
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _convert_leaf(mapped, v)
    return out


def load_dana_checkpoint(path: str, allow_pickle: bool = False):
    """-> (param_tree, extra) where extra carries epoch/pooling_mode."""
    state, extra = load_state_dict(path, allow_pickle=allow_pickle)
    return convert_dana_state_dict(state), extra


def export_dana_state_dict(params: dict) -> dict:
    """Inverse of convert_dana_state_dict: nested dana_tpu param tree ->
    flat reference-named torch-layout state dict (numpy arrays).

    Used by the dress-rehearsal harness to author a reference-style
    model_<e>_<s>.pth (the exact wrapper train.py:183-189 writes) from
    our params, so the README's verbatim inference command can be
    exercised against the exact checkpoint format.  Adds the
    num_batches_tracked buffers torch BN state dicts carry."""
    inv = {v: k for k, v in _BASE_MAP.items()}
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            name = f'{prefix}.{k}' if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            else:
                flat[name] = np.asarray(v)
    walk(params, '')

    out = {}
    for name, v in flat.items():
        mapped = name
        for src, dst in inv.items():
            if name.startswith(src + '.'):
                mapped = dst + name[len(src):]
                break
        if v.ndim == 4:                      # conv HWIO -> OIHW
            v = np.ascontiguousarray(v.transpose(3, 2, 0, 1))
        elif v.ndim == 2 and mapped.endswith('weight'):
            v = np.ascontiguousarray(v.T)    # linear [in,out] -> [out,in]
            if mapped == 'RCNN_cls_score.weight' and \
                    v.shape[1] == int(np.prod(_FGN_CLS_IN)):
                c, h, w = _FGN_CLS_IN        # (h,w,c) flat -> (c,h,w) flat
                v = np.ascontiguousarray(
                    v.reshape(-1, h, w, c).transpose(0, 3, 1, 2)
                     .reshape(v.shape[0], -1))
        out[mapped] = v
        if mapped.endswith('running_var'):
            out[mapped[:-len('running_var')] + 'num_batches_tracked'] = \
                np.asarray(0, np.int64)
    return out


def save_reference_pth(path: str, params: dict, epoch: int = 4,
                       pooling_mode: str = 'align', lr=None):
    """Write params as a reference-format checkpoint (train.py:183-189
    payload: {'model', 'epoch', 'optimizer', 'pooling_mode'})."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_dana_state_dict(params).items()}
    payload = {'model': sd, 'epoch': epoch, 'optimizer': {},
               'pooling_mode': pooling_mode}
    if lr is not None:
        payload['lr'] = lr
    torch.save(payload, path)
    return path


def load_caffe_resnet(path: str, allow_pickle: bool = False) -> dict:
    """Backbone-only checkpoint (data/pretrained_model/resnet50_caffe.pth,
    dana.py:330,339-341) -> backbone param subtree."""
    state, _ = load_state_dict(path, allow_pickle=allow_pickle)
    from dana_tpu.models.resnet import convert_torch_state_dict
    return convert_torch_state_dict(state)
