"""Host-side image blob preparation.

Parity with /root/reference/lib/model/utils/blob.py:20-52 and
minibatch.py:22-96: BGR channel order, Caffe pixel-mean subtraction,
shortest-side scaling with a max-size cap — but padded onto a *static
bucket canvas* (TPU: each bucket compiles exactly once) instead of the
reference's per-batch dynamic padding (fs_loader.py:39-53).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:                                    # pragma: no cover
    cv2 = None

# (H, W) canvases: landscape / portrait / square, sized to cover the
# reference TRAIN/TEST scales (600 shortest / 1000 max, config.py SCALES).
DEFAULT_BUCKETS = ((608, 1024), (1024, 608), (704, 704))


def imread_bgr(path: str) -> np.ndarray:
    """Read image as float32 BGR HWC (grayscale -> 3ch), like
    minibatch.py:76-81 (cv2.imread is already BGR)."""
    im = cv2.imread(path, cv2.IMREAD_COLOR)
    if im is None:
        raise FileNotFoundError(path)
    return im.astype(np.float32)


def prep_im_for_blob(im, pixel_means, target_size, max_size):
    """Mean-subtract and scale shortest side to target (cap max side).

    Returns (image, scale). Parity: blob.py:35-52."""
    im = im.astype(np.float32) - pixel_means
    h, w = im.shape[:2]
    im_size_min, im_size_max = min(h, w), max(h, w)
    scale = float(target_size) / im_size_min
    if round(scale * im_size_max) > max_size:
        scale = float(max_size) / im_size_max
    im = cv2.resize(im, None, fx=scale, fy=scale,
                    interpolation=cv2.INTER_LINEAR)
    return im, scale


def pick_bucket(h, w, buckets=DEFAULT_BUCKETS):
    """Smallest-area bucket that contains (h, w); falls back to the
    smallest bucket that fits after further downscale."""
    fitting = [b for b in buckets if b[0] >= h and b[1] >= w]
    if fitting:
        return min(fitting, key=lambda b: b[0] * b[1])
    # shouldn't happen with reference scales; use max-area bucket
    return max(buckets, key=lambda b: b[0] * b[1])


def pad_to_canvas(im, canvas_hw):
    """Zero-pad HWC image onto the (H, W) canvas (top-left anchored, like
    the reference's padding_data)."""
    h, w = im.shape[:2]
    ch, cw = canvas_hw
    out = np.zeros((ch, cw, im.shape[2]), np.float32)
    out[:h, :w] = im[:ch, :cw]
    return out


def query_blob(im, pixel_means, target_size=600, max_size=1000,
               flipped=False, buckets=DEFAULT_BUCKETS):
    """Full query pipeline: (raw BGR image) -> (canvas image [H,W,3],
    im_info (h, w, scale)).  im_info carries the *real* scaled size; the
    canvas padding beyond it is masked downstream (outside-image anchors,
    proposal clipping)."""
    if flipped:
        im = im[:, ::-1, :]
    im, scale = prep_im_for_blob(im, pixel_means, target_size, max_size)
    h, w = im.shape[:2]
    canvas = pick_bucket(h, w, buckets)
    return pad_to_canvas(im, canvas), np.array([h, w, scale], np.float32)


def support_blob(im, box, pixel_means, out_size=320):
    """Crop a support box, resize long side -> out_size, zero-pad to
    [out_size, out_size, 3].  Parity: fs_loader.py:103-138 (crop includes
    the +1 end pixel; cv2 INTER_LINEAR; top-left padding)."""
    im = im.astype(np.float32) - pixel_means
    x1, y1, x2, y2 = [int(v) for v in box[:4]]
    crop = im[y1:y2 + 1, x1:x2 + 1, :]
    h, w = crop.shape[:2]
    if h >= w:
        new_h, new_w = out_size, max(1, int(w * float(out_size) / h))
    else:
        new_h, new_w = max(1, int(h * float(out_size) / w)), out_size
    crop = cv2.resize(crop, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    out = np.zeros((out_size, out_size, 3), np.float32)
    out[:crop.shape[0], :crop.shape[1]] = crop
    return out
