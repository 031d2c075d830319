"""Host-side image blob preparation.

Parity with /root/reference/lib/model/utils/blob.py:20-52 and
minibatch.py:22-96: BGR channel order, Caffe pixel-mean subtraction,
shortest-side scaling — but padded onto a *static bucket canvas* (TPU:
each bucket compiles exactly once) instead of the reference's per-batch
dynamic padding (fs_loader.py:39-53).

Scale parity note: the reference's MAX_SIZE cap is COMMENTED OUT
(blob.py:44-46) — its effective behavior is pure shortest-side scaling,
so eval images can exceed 1000 px on the long side.  `max_size=None`
here reproduces that exactly (the default through cfg.TPU.
EXACT_QUERY_SCALE); passing a number restores the capped py-faster-rcnn
behavior as an explicit deviation knob.  Images wider than every static
bucket get a dynamically synthesized canvas (snapped to multiples of 64
so the rare aspect outliers share compilations).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:                                    # pragma: no cover
    cv2 = None

from dana_tpu import native as _native

# (H, W) canvases: landscape / portrait / square, sized to cover the
# reference TEST scale (600 shortest side, uncapped long side) for
# aspect ratios up to 2 — beyond that snap_bucket synthesizes a canvas.
DEFAULT_BUCKETS = ((608, 1024), (1024, 608), (704, 704),
                   (608, 1216), (1216, 608))

# Rounded BGR Caffe means: padding value for RAW-uint8 surfaces
# (TPU.SHIP_UINT8) so pads land at ~0 after the device's mean-sub, like
# the f32 path's zero padding in mean-subtracted space.
U8_PAD_MEANS = np.array([103, 116, 123], np.uint8)


def u8_pad_of(pixel_means):
    """Rounded per-channel means as the raw-uint8 pad value (maps to ~0
    after the device's mean subtraction).  Tracks cfg.PIXEL_MEANS
    overrides instead of assuming the Caffe defaults."""
    return np.clip(np.round(np.asarray(pixel_means, np.float64).ravel()),
                   0, 255).astype(np.uint8)


class FIFOCache:
    """Tiny bounded FIFO map for decoded support crops (one eviction
    policy shared by FewShotLoader, FinetuneLoader and
    ResamplingSupportPool).  cap=0 disables caching entirely.

    Thread-safe: episode assembly runs under EpisodicBatcher's worker
    pool (num_workers > 1), where concurrent get/put on the shared cache
    would otherwise race the eviction pop.  Values are immutable decoded
    arrays, so two threads racing a miss on the same key just compute
    the same value twice — correctness only needs the dict/evict ops
    themselves to be atomic."""

    def __init__(self, cap):
        import threading as _threading
        self.cap = int(cap)
        self._d = {}
        self._lock = _threading.Lock()

    def get(self, key):
        if not self.cap:
            return None
        with self._lock:
            return self._d.get(key)

    def put(self, key, value):
        if not self.cap:
            return value
        with self._lock:
            if key not in self._d and len(self._d) >= self.cap:
                self._d.pop(next(iter(self._d)))
            self._d[key] = value
        return value


def query_scale(h, w, target_size, max_size=None) -> float:
    """The reference's effective query scale: shortest side -> target,
    long-side cap only if max_size is given (blob.py:40-46: the cap is
    commented out, so the published checkpoints saw uncapped scaling)."""
    scale = float(target_size) / min(h, w)
    if max_size and round(scale * max(h, w)) > max_size:
        scale = float(max_size) / max(h, w)
    return scale


def snap_bucket(h, w, multiple=64):
    """Synthesize a canvas for shapes no static bucket contains: round
    each side up to `multiple` (bounds the distinct compile shapes)."""
    snap = lambda v: int(-(-int(v) // multiple) * multiple)
    return (snap(h), snap(w))


class ImageCache:
    """Byte-bounded LRU of decoded images (uint8 BGR, read-only views).

    Shared by every imread_bgr caller — query blobs, support crops,
    directory pools — so a support crop whose source image is cached
    costs crop+resize instead of a JPEG decode.  Values are stored with
    writeable=False and returned without copying; callers convert with
    astype (always a fresh array).  Thread-safe for EpisodicBatcher's
    worker pool.

    Keys are paths and entries NEVER invalidate: dataset images are
    assumed immutable for the process lifetime (true of every loader
    here — roidbs are built once from an on-disk layout).  A process
    that rewrites image files in place must call clear_image_cache()
    (tests do) or run with IMAGE_CACHE_MB=0."""

    def __init__(self, cap_mb):
        import threading as _threading
        from collections import OrderedDict
        self.cap_bytes = int(cap_mb) * (1 << 20)
        self._d = OrderedDict()   # path -> uint8 array; front = LRU
        self._bytes = 0
        self._lock = _threading.Lock()

    def get(self, path):
        with self._lock:
            arr = self._d.get(path)
            if arr is not None:
                self._d.move_to_end(path)
            return arr

    def put(self, path, arr):
        if arr.nbytes > self.cap_bytes:
            return arr
        arr = arr.copy()
        arr.flags.writeable = False
        with self._lock:
            old = self._d.pop(path, None)
            if old is not None:
                self._bytes -= old.nbytes
            while self._bytes + arr.nbytes > self.cap_bytes and self._d:
                _, ev = self._d.popitem(last=False)
                self._bytes -= ev.nbytes
            self._d[path] = arr
            self._bytes += arr.nbytes
        return arr


_image_cache = None
_image_cache_mb = None


def _get_image_cache():
    """cfg-gated module-level cache (cfg.TPU.IMAGE_CACHE_MB; 0 = off),
    rebuilt when the configured size changes."""
    global _image_cache, _image_cache_mb
    from dana_tpu.utils.config import cfg
    mb = int(cfg.TPU.IMAGE_CACHE_MB)
    if mb != _image_cache_mb:
        _image_cache_mb = mb
        _image_cache = ImageCache(mb) if mb > 0 else None
    return _image_cache


def clear_image_cache():
    """Drop all cached decodes (tests: same path, new pixels)."""
    global _image_cache, _image_cache_mb
    _image_cache = None
    _image_cache_mb = None


def imread_bgr(path: str) -> np.ndarray:
    """Read image as float32 BGR HWC (grayscale -> 3ch), like
    minibatch.py:76-81 (cv2.imread is already BGR).  Decodes go through
    the byte-bounded ImageCache (hit = astype, ~8x cheaper than a
    re-decode); the returned f32 array is always freshly allocated."""
    cache = _get_image_cache()
    if cache is not None:
        hit = cache.get(path)
        if hit is not None:
            return hit.astype(np.float32)
    im = cv2.imread(path, cv2.IMREAD_COLOR)
    if im is None:
        raise FileNotFoundError(path)
    if cache is not None:
        cache.put(path, im)
    return im.astype(np.float32)


def prep_im_for_blob(im, pixel_means, target_size, max_size=None):
    """Mean-subtract and scale shortest side to target (long-side cap
    only when max_size is given; None = the reference's effective
    cap-disabled behavior, blob.py:44-46).

    Returns (image, scale). Parity: blob.py:35-52."""
    sub = _native.meansub(im, pixel_means)   # fused native pass, ~6x numpy
    # f32 means keep the fallback BIT-IDENTICAL to the native kernel
    # (cfg.PIXEL_MEANS is float64; the bare broadcast would promote the
    # whole image to f64 and make DANA_NO_NATIVE A/B runs drift ~2e-5)
    im = sub if sub is not None else \
        im.astype(np.float32) - np.asarray(pixel_means, np.float32)
    h, w = im.shape[:2]
    scale = query_scale(h, w, target_size, max_size)
    im = cv2.resize(im, None, fx=scale, fy=scale,
                    interpolation=cv2.INTER_LINEAR)
    return im, scale


def pick_bucket(h, w, buckets=DEFAULT_BUCKETS):
    """Smallest-area bucket that contains (h, w); aspect outliers no
    static bucket covers get a synthesized snapped canvas (the former
    fallback silently CROPPED the image to the largest bucket)."""
    fitting = [b for b in buckets if b[0] >= h and b[1] >= w]
    if fitting:
        return min(fitting, key=lambda b: b[0] * b[1])
    return snap_bucket(h, w)


def pad_to_canvas(im, canvas_hw):
    """Zero-pad HWC image onto the (H, W) canvas (top-left anchored, like
    the reference's padding_data)."""
    h, w = im.shape[:2]
    ch, cw = canvas_hw
    out = np.zeros((ch, cw, im.shape[2]), np.float32)
    out[:h, :w] = im[:ch, :cw]
    return out


def query_blob(im, pixel_means, target_size=600, max_size=None,
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


def s2d_pack(im, u8_pad=None):
    """HOST-side 2x2 space-to-depth packing for the ResNet stem.

    [(B,) H, W, 3] -> [(B,) H/2+3, W/2+3, 12] with the conv1 pad-3
    pre-applied, so the device stem is a dense 4x4/1 VALID conv over 12
    channels instead of a 7x7/2 conv over 3 (4x less TPU lane waste; the
    DEVICE-side reshape was measured slower than the waste it removes —
    resnet._conv7x7s2_s2d docstring — but numpy packing is absorbed by
    the loader pipeline).  Exact: resnet.conv1_s2d(s2d_pack(x)) equals
    the direct conv1 (tests/test_stem_s2d.py).  Requires even H, W —
    true for every bucket canvas (all multiples of 16)."""
    single = im.ndim == 3
    if single:
        im = im[None]
    b, h, w, c = im.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    if c == 3 and im.dtype in (np.float32, np.uint8) and _native.available():
        # fused native pack (native/host_ops.cpp pad_s2d_*): one pass,
        # no padded intermediate — ~6x the strided-numpy formulation on
        # this one-core host; bit-identical layout (tests/test_native.py)
        pad3 = ((U8_PAD_MEANS if u8_pad is None else u8_pad)
                if im.dtype == np.uint8 else None)
        out = [_native.pad_s2d(np.ascontiguousarray(im[i]), (h, w), pad3)
               for i in range(b)]
        if all(o is not None for o in out):
            xd = np.stack(out)
            return xd[0] if single else xd
    if im.dtype == np.uint8 and c == 3:
        # raw uint8 pixels (TPU.SHIP_UINT8): the conv pad-3 border must
        # be ~0 AFTER device mean-sub -> fill with the rounded means
        xp = np.empty((b, h + 6, w + 6, c), im.dtype)
        xp[:] = U8_PAD_MEANS if u8_pad is None else u8_pad
    else:
        xp = np.zeros((b, h + 6, w + 6, c), im.dtype)
    xp[:, 3:3 + h, 3:3 + w] = im
    hp, wp = h + 6, w + 6
    # four strided slice-copies instead of a 6-D transpose (the transpose
    # formulation measured 170 ms per bs8 batch on one core; slicing is
    # ~10x cheaper and the output channel order (row-phase, col-phase, c)
    # is identical)
    xd = np.empty((b, hp // 2, wp // 2, 4 * c), im.dtype)
    for i2 in range(2):
        for j2 in range(2):
            k = (i2 * 2 + j2) * c
            xd[..., k:k + c] = xp[:, i2::2, j2::2, :]
    return xd[0] if single else xd


def s2d_pack_any(x, u8_pad=None):
    """s2d_pack over arbitrary leading dims ([..., H, W, 3])."""
    lead = x.shape[:-3]
    flat = x.reshape((-1,) + x.shape[-3:])
    out = s2d_pack(flat, u8_pad=u8_pad)
    return out.reshape(lead + out.shape[1:])


def query_blob_u8(im, target_size=600, max_size=None, flipped=False,
                  buckets=DEFAULT_BUCKETS, pixel_means=None):
    """uint8 query pipeline (TPU.SHIP_UINT8): raw BGR uint8 resized and
    padded WITHOUT mean subtraction — the device applies the means
    (dana.forward), so the wire carries 4x fewer bytes than float32.

    Deviation vs the exact f32 path: cv2 INTER_LINEAR on uint8 rounds
    each output pixel to an integer (<=1 LSB vs resizing the float
    image; mean subtraction itself commutes with the affine resample, so
    the only difference is that rounding).  Keep TPU.SHIP_UINT8 off for
    bit-exact parity runs."""
    if flipped:
        im = im[:, ::-1, :]
    im = np.ascontiguousarray(im, np.uint8)
    h, w = im.shape[:2]
    scale = query_scale(h, w, target_size, max_size)
    im = cv2.resize(im, None, fx=scale, fy=scale,
                    interpolation=cv2.INTER_LINEAR)
    h, w = im.shape[:2]
    canvas = pick_bucket(h, w, buckets)
    ch, cw = canvas
    # pad with the ROUNDED means: raw-space mean maps to ~0 after the
    # device's mean subtraction, matching the f32 path's zero padding
    # in mean-subtracted space (within 0.5 LSB)
    out = np.empty((ch, cw, 3), np.uint8)
    out[:] = (U8_PAD_MEANS if pixel_means is None
              else u8_pad_of(pixel_means))
    out[:h, :w] = im[:ch, :cw]
    return out, np.array([h, w, scale], np.float32)


def query_blob_packed(im, pixel_means, target_size=600, max_size=None,
                      flipped=False, buckets=DEFAULT_BUCKETS,
                      ship_uint8=False):
    """query_blob (or query_blob_u8) fused with the stem's s2d packing:
    (raw BGR image) -> ([(H+6)/2, (W+6)/2, 12], im_info).

    Numerically identical to `s2d_pack(query_blob(...)[0])` (pinned by
    tests/test_native.py) but runs the canvas pad + pack as ONE native
    pass straight from the resized image — the padded 3-channel canvas
    never exists (~11 ms/img of numpy traffic on this host).  Falls back
    to the two-step path when the native library is unavailable, and to
    the UNPACKED 3-channel canvas when it can't be s2d-packed at all
    (odd user-set bucket — s2d needs even dims); the model's stem
    branches on the input channel count (resnet.stem_conv), so 3-channel
    batches still run, just without the packed-stem win."""
    if ship_uint8:
        if flipped:
            im = im[:, ::-1, :]
        imu = np.ascontiguousarray(im, np.uint8)
        h, w = imu.shape[:2]
        scale = query_scale(h, w, target_size, max_size)
        imu = cv2.resize(imu, None, fx=scale, fy=scale,
                         interpolation=cv2.INTER_LINEAR)
        h, w = imu.shape[:2]
        canvas = pick_bucket(h, w, buckets)
        pad3 = (U8_PAD_MEANS if pixel_means is None
                else u8_pad_of(pixel_means))
        packed = _native.pad_s2d(imu, canvas, pad3)
        if packed is None:
            data, info = query_blob_u8(im, target_size, max_size,
                                       buckets=buckets,
                                       pixel_means=pixel_means)
            if data.shape[0] % 2 or data.shape[1] % 2:  # odd custom bucket
                return data, info
            return s2d_pack(data, u8_pad=pad3), info
        return packed, np.array([h, w, scale], np.float32)
    if flipped:
        im = im[:, ::-1, :]
    sub = _native.meansub(np.ascontiguousarray(im), pixel_means)
    if sub is None:                                     # no native lib
        data, info = query_blob(im, pixel_means, target_size, max_size,
                                buckets=buckets)
        if data.shape[0] % 2 or data.shape[1] % 2:      # odd custom bucket
            return data, info
        return s2d_pack(data), info
    h, w = sub.shape[:2]
    scale = query_scale(h, w, target_size, max_size)
    sub = cv2.resize(sub, None, fx=scale, fy=scale,
                     interpolation=cv2.INTER_LINEAR)
    h, w = sub.shape[:2]
    canvas = pick_bucket(h, w, buckets)
    info = np.array([h, w, scale], np.float32)
    packed = _native.pad_s2d(sub, canvas)
    if packed is None:
        if canvas[0] % 2 or canvas[1] % 2:              # odd custom bucket
            return pad_to_canvas(sub, canvas), info
        return s2d_pack(pad_to_canvas(sub, canvas)), info
    return packed, info


def support_blob(im, box, pixel_means, out_size=320):
    """Crop a support box, resize long side -> out_size, zero-pad to
    [out_size, out_size, 3] (single resampling pass; crop includes the
    +1 end pixel; cv2 INTER_LINEAR; top-left padding).

    NOTE: this is the fast *approximation* of fs_loader.py:103-138 — the
    reference first scales the whole source image (shortest-side-600 via
    get_minibatch), truncates the scaled box to int16, crops from the
    SCALED image, and computes the final resize factor from the box
    extents WITHOUT the +1.  `support_blob_exact` reproduces that
    pipeline bit-for-bit; cfg.TPU.EXACT_SUPPORT_SCALE picks it (default
    on — FewShotLoader)."""
    sub = _native.meansub(im, pixel_means)
    im = sub if sub is not None else \
        im.astype(np.float32) - np.asarray(pixel_means, np.float32)
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


def support_blob_exact(im, box, pixel_means, out_size=320,
                       target_size=600, max_size=None):
    """Bit-exact replica of the reference training support crop
    (fs_loader.py:113-138):

      1. the SOURCE image is run through prep_im_for_blob (mean-sub +
         shortest-side target_size scaling, long-side cap disabled —
         exactly `get_minibatch([support_roidb])`),
      2. the box is scaled by that factor and truncated to int16,
      3. the crop takes the +1 end pixel,
      4. the long-side->out_size resize factor uses the box extents
         WITHOUT the +1 (`box_h = y_max - y_min`), with the strict
         `box_h > box_w` branch, so the short side lands on
         int(short * out_size / long) while the long side is pinned to
         out_size,
      5. top-left zero-pad onto [out_size, out_size, 3].

    A/B-pinned against the reference's own FewShotLoader in
    tests/test_reference_ab.py.

    Deliberate deviation: the short-side resize extent is clamped to
    `max(1, ...)` where the reference has no clamp — a zero-size result
    makes the reference's cv2.resize raise.  Unreachable for training
    supports (the support DB filters to >=64px boxes, aspect<=2) but
    reachable via inference_loader._crop_support's arbitrary roidb
    boxes; the clamp only fires where the reference would crash."""
    im, scale = prep_im_for_blob(im, pixel_means, target_size, max_size)
    b = (np.asarray(box[:4], np.float32) * np.float32(scale)) \
        .astype(np.int16)
    x_min, y_min, x_max, y_max = [int(v) for v in b]
    box_h, box_w = y_max - y_min, x_max - x_min
    crop = im[y_min:y_max + 1, x_min:x_max + 1, :]
    if box_h > box_w:
        new_h = out_size
        new_w = max(1, int(box_w * (float(out_size) / float(box_h))))
    else:
        new_w = out_size
        new_h = max(1, int(box_h * (float(out_size) / float(box_w))))
    crop = cv2.resize(crop, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    out = np.zeros((out_size, out_size, 3), np.float32)
    out[:crop.shape[0], :crop.shape[1]] = crop
    return out


def support_blob_whole(im, pixel_means, out_size=320):
    """Bit-exact replica of the reference's WHOLE-IMAGE support prep —
    the directory-pool path used at eval time (inference_loader.py:95-109,
    same code in multiway/finetune/allcls loaders and utils.py
    support_im_preprocess):

      1. prep_im_for_blob with target_size = min(h, w): scale is exactly
         1.0 (the long-side cap is commented out in the reference), so
         this is mean-subtraction plus an identity cv2.resize,
      2. the long side is resized to out_size with the STRICT `_h > _w`
         branch (square images take the else arm) and the short side to
         int(short * (float(out_size) / float(long))) — the reference
         computes the ratio FIRST, so the expression order is replicated
         for int-truncation boundary cases,
      3. top-left zero-pad onto [out_size, out_size, 3].

    A/B-pinned against the reference's own InferenceLoader in
    tests/test_reference_ab.py.

    Deliberate deviation (same as support_blob_exact's): the short-side
    extent is clamped to max(1, ...) — the reference has no clamp and
    its cv2.resize raises on aspect ratios beyond out_size, reachable
    here via arbitrary user demo images (utils.support_im_preprocess)."""
    im, _ = prep_im_for_blob(im, pixel_means,
                             int(np.min(im.shape[:2])), None)
    h, w = im.shape[:2]
    if h > w:
        resize_scale = float(out_size) / float(h)
        im = cv2.resize(im, (max(1, int(w * resize_scale)), out_size),
                        interpolation=cv2.INTER_LINEAR)
    else:
        resize_scale = float(out_size) / float(w)
        im = cv2.resize(im, (out_size, max(1, int(h * resize_scale))),
                        interpolation=cv2.INTER_LINEAR)
    out = np.zeros((out_size, out_size, 3), np.float32)
    out[:im.shape[0], :im.shape[1]] = im
    return out
