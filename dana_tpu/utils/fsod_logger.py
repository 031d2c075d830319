"""TensorBoard training/inference loggers.

Parity: /root/reference/lib/model/utils/fsod_logger.py:8-131 —
`FSODLogger.write` records the five loss scalars per epoch and, when
`save_im`, image grids of the query (with gt boxes drawn), the supports,
and predicted boxes; `FSODInferenceLogger` records eval images.  Uses
torch.utils.tensorboard when available, else accumulates in memory (the
rest of the framework never depends on TB being importable).
"""

from __future__ import annotations

import numpy as np


def _to_uint8(im_bgr_meansub, pixel_means):
    im = np.asarray(im_bgr_meansub, np.float32) + pixel_means
    return np.clip(im[..., ::-1], 0, 255).astype(np.uint8)  # BGR->RGB


def draw_boxes(im_rgb, boxes, color=(0, 255, 0), width=2):
    """Draw [N, >=4] boxes in place on an HWC uint8 image."""
    im = im_rgb.copy()
    h, w = im.shape[:2]
    for b in np.asarray(boxes):
        x1, y1, x2, y2 = [int(round(v)) for v in b[:4]]
        if x2 <= x1 or y2 <= y1:
            continue
        x1, x2 = np.clip([x1, x2], 0, w - 1)
        y1, y2 = np.clip([y1, y2], 0, h - 1)
        for dx in range(width):
            im[np.clip(y1 + dx, 0, h - 1), x1:x2 + 1] = color
            im[np.clip(y2 - dx, 0, h - 1), x1:x2 + 1] = color
            im[y1:y2 + 1, np.clip(x1 + dx, 0, w - 1)] = color
            im[y1:y2 + 1, np.clip(x2 - dx, 0, w - 1)] = color
    return im


class FSODLogger:
    def __init__(self, log_dir, pixel_means=None):
        from dana_tpu.utils.config import cfg
        self.pixel_means = (pixel_means if pixel_means is not None
                            else cfg.PIXEL_MEANS)
        self._scalars = []
        self._images = []
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def write(self, step, losses: dict, batch=None, predictions=None,
              save_im=False):
        """losses: {'loss', 'loss_rpn_cls', ...} scalars; batch optionally
        carries im_data/support_ims/gt_boxes for image grids."""
        for k, v in losses.items():
            self._scalars.append((step, k, float(v)))
            if self._tb is not None:
                self._tb.add_scalar(k, float(v), step)
        if save_im and batch is not None and self._tb is not None:
            im = _to_uint8(batch['im_data'][0], self.pixel_means)
            gt = np.asarray(batch['gt_boxes'][0])
            self._tb.add_image('query', draw_boxes(im, gt), step,
                               dataformats='HWC')
            sups = batch.get('support_ims')
            if sups is not None:
                for i, s in enumerate(np.asarray(sups[0])):
                    self._tb.add_image(
                        f'support/{i}', _to_uint8(s, self.pixel_means),
                        step, dataformats='HWC')
            if predictions is not None:
                self._tb.add_image(
                    'predictions',
                    draw_boxes(im, np.asarray(predictions),
                               color=(255, 0, 0)),
                    step, dataformats='HWC')
        if self._tb is not None:
            self._tb.flush()

    @property
    def scalars(self):
        return list(self._scalars)


class FSODInferenceLogger(FSODLogger):
    def write(self, step, batch=None, predictions=None, save_im=True):
        super().write(step, {}, batch=batch, predictions=predictions,
                      save_im=save_im)

    def write_attention(self, step, params, config, batch,
                        tag='attention'):
        """CISA RPN attention relevance overlaid on the query image
        (models/viz.py); batch carries preprocessed im_data [B, H, W, 3]
        and support_ims [B, n, sh, sw, 3].  Stored in memory (and TB when
        available) so eval runs can dump what the reference only exposed
        through notebook eyeballing."""
        from dana_tpu.models.viz import (overlay_heatmap,
                                         rpn_attention_relevance)
        q = np.asarray(batch['im_data'][0])
        sup = np.asarray(batch['support_ims'][0])
        heat = rpn_attention_relevance(params, config, q, sup)
        im = overlay_heatmap(_to_uint8(q, self.pixel_means), heat)
        self._images.append((step, tag, im))
        if self._tb is not None:
            self._tb.add_image(tag, im, step, dataformats='HWC')
            self._tb.flush()
        return im
