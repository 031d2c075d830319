"""Episodic evaluation CLI.

Parity: /root/reference/inference.py:25-181 — checkpoint load, per-image
episodic eval against each image's fixed target class (only class
j == target is scored, inference.py:131-139), score threshold 0.05 + NMS
0.3 + top-100, pickled all_boxes, imdb.evaluate_detections -> COCOeval.

TPU re-design: images grouped into static-bucket batches; decode + NMS
run jitted on device (engine/postprocess.py); supports come from the
data/supports directory pool when present, else from the training-split
roidb (environment-local datasets).
"""

from __future__ import annotations

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from utils import parse_args, load_cfg, get_model


def main(argv=None):
    args = parse_args(argv)
    cfg = load_cfg(args)
    np.random.seed(args.seed)

    import jax

    if args.dist:
        # multi-host eval is embarrassingly parallel: ranks split the
        # chunk list, each runs an INDEPENDENT local-device mesh (params
        # replicated — no cross-host collectives), and the chief merges
        # the per-rank partial detections before COCOeval.  initialize
        # must precede the first backend query.
        from dana_tpu.parallel.distributed import init_distributed
        init_distributed(args.coordinator, args.num_procs, args.proc_id)
        print(f'distributed eval: process {jax.process_index()}/'
              f'{jax.process_count()}, '
              f'{len(jax.local_devices())} local devices', flush=True)

    import jax.numpy as jnp
    from dana_tpu.data.imdb import combined_roidb
    from dana_tpu.data.inference_loader import InferenceLoader, SupportPool
    from dana_tpu.engine.postprocess import postprocess_batch
    from dana_tpu.models import dana
    from dana_tpu.models.layers import to_jnp
    from dana_tpu.utils import checkpoint as ckpt_lib

    imdb_, roidb, _, _ = combined_roidb(args.imdbval_name, training=False,
                                        use_flipped=False)
    num_images = len(roidb)
    print(f'{num_images} eval images')

    config, params = get_model(args.net, way=args.way, shot=args.shot,
                               net=args.backbone, seed=args.seed)
    if args.checkpath or args.resume:
        path = args.checkpath or ckpt_lib.checkpoint_path(
            args.load_dir, args.checkepoch, args.checkpoint)
        if not os.path.exists(path):
            # the README inference command points --load_dir at a torch
            # checkpoint tree (model_4_299.pth): fall back across formats
            base, ext = os.path.splitext(path)
            for cand in (base + '.pth', f'{base}_preempt{ext}'):
                if os.path.exists(cand):
                    path = cand
                    break
        payload = ckpt_lib.load_checkpoint(path)
        params = payload['model']
        # the checkpoint carries POOLING_MODE (reference train.py:100):
        # propagate it into BOTH the global cfg and the already-built
        # model config, which froze the pre-checkpoint value
        cfg.POOLING_MODE = payload.get('pooling_mode', cfg.POOLING_MODE)
        if config.pooling_mode != cfg.POOLING_MODE:
            import dataclasses
            config = dataclasses.replace(config,
                                         pooling_mode=cfg.POOLING_MODE)
        print(f'loaded checkpoint {path}')
    if cfg.TPU.QUANT_INT8:
        # int8 PTQ serving path (dana_tpu/quant.py): BN-folded
        # per-channel int8 conv weights, dynamic activation scales
        from dana_tpu import quant
        params = quant.quantize_params(params, scope=cfg.TPU.QUANT_SCOPE)
        n_q = quant.count_int8(params)
        if n_q:
            print(f'int8-quantized {n_q} convs '
                  f'(scope={cfg.TPU.QUANT_SCOPE}) + int8 roi_align')
        else:
            print(f'WARNING: TPU.QUANT_INT8 quantized 0 convs for this '
                  f'backbone/scope ({cfg.TPU.QUANT_SCOPE}) — only the '
                  f'int8 roi_align path is active')
    params = to_jnp(params)

    sup_dir = os.path.join(cfg.DATA_DIR, 'supports') \
        if args.sup_dir == 'all' else args.sup_dir
    support_roidb = None
    if not os.path.isdir(sup_dir):
        # environment-local fallback: crops from the train split
        from dana_tpu.data.imdb import combined_roidb as crb
        train_name = args.imdbval_name.replace('test', 'train') \
            if 'synth' in args.imdbval_name else args.imdbval_name
        try:
            _, support_roidb, _, _ = crb(train_name, training=False,
                                         use_flipped=False)
        except KeyError:
            # no matching train split registered: draw supports from the
            # eval split's own annotations — a query image's own gt crop
            # can then serve as its support, which INFLATES AP vs the
            # reference protocol.  Loud so nobody mistakes such a run
            # for a protocol-faithful number.
            print(f'WARNING: no support split for {args.imdbval_name} '
                  f'(tried {train_name}); falling back to the EVAL '
                  f'split\'s own annotations — AP is not '
                  f'protocol-comparable', flush=True)
            support_roidb = roidb
        sup_dir = None
    pool = SupportPool(imdb_.classes, args.shot, support_dir=sup_dir,
                       support_roidb=support_roidb, seed=0)
    from dana_tpu.models import frameworks
    model_name = 'DAnA' if args.net in ('res50', 'res101', 'vgg16') \
        else args.net
    use_sup_cache = model_name in ('DAnA', 'cisa')

    # s2d packing maps a canvas H to H/2+3 (blob.s2d_pack) — always odd,
    # so it can never shard over the --sp spatial axis; SP serving uses
    # the direct 3-channel stem (canvas heights are multiples of 64).
    pack_s2d = bool(cfg.TPU.STEM_S2D) and args.backbone != 'vgg16' \
        and max(1, getattr(args, 'sp', 0)) <= 1
    loader = InferenceLoader(roidb, pool,
                             max_num_box=cfg.MAX_NUM_GT_BOXES,
                             # queries arrive stem-packed [H',W',12] from
                             # the fused native pad+s2d kernel
                             pack_s2d=pack_s2d,
                             # cached-support models never read per-item
                             # support stacks — don't assemble them
                             skip_supports=use_sup_cache)

    @jax.jit
    def encode_supports(params, sup):
        return dana.extract_support_feats(params, config, sup)

    _sup_cache = {}

    def batch_support_feats(classes):
        """Per-class support features, encoded once (the reference
        re-runs the support backbone for every query image)."""
        for c in {int(c) for c in classes}:
            if c not in _sup_cache:
                s = np.asarray(pool.get(c))[None]
                if pack_s2d:
                    s = blob_lib.s2d_pack_any(s)
                s = jnp.asarray(s)
                _sup_cache[c] = encode_supports(params, s)
        fs = [_sup_cache[int(c)] for c in classes]
        return (jnp.concatenate([f[0] for f in fs]),
                jnp.concatenate([f[1] for f in fs]))

    def forward(params, im_data, im_info, support_arg):
        if use_sup_cache:
            return dana.forward(params, config, im_data, im_info,
                                training=False, support_feats=support_arg)
        if model_name == 'frcnn':
            return frameworks.frcnn_forward(params, config, im_data,
                                            im_info, training=False)
        return frameworks.forward_fn(model_name)(
            params, config, im_data, im_info, support_arg, training=False)

    @jax.jit
    def predict(params, im_data, im_info, support_arg):
        out = forward(params, im_data, im_info, support_arg)
        return postprocess_batch(
            out['rois'], out['cls_prob'], out['bbox_pred'], im_info,
            bbox_stds=tuple(cfg.TRAIN.BBOX_NORMALIZE_STDS),
            bbox_means=tuple(cfg.TRAIN.BBOX_NORMALIZE_MEANS),
            nms_thresh=cfg.TEST.NMS)

    # group images by bucket for static batches
    eval_bs = max(1, args.batch_size)

    # --mGPUs: data-parallel eval over all local devices — query batch
    # sharded on the mesh's 'data' axis, params/support-features
    # replicated; XLA partitions the whole forward (the reference's only
    # eval parallelism is none — inference.py:88 runs bs=1 serially).
    # --tp N: latency-mode serving — the wide projection weights shard
    # over a (data, model=N) mesh (parallel.shard_params_tp) so EACH
    # query's forward spreads over N chips; combines with --mGPUs for a
    # full dp x tp serving mesh.
    # --sp N: spatial partitioning — each query image's H axis shards
    # over the mesh's 'model' axis; GSPMD spatially partitions the
    # backbone convs and inserts the halo exchanges.  The latency lever
    # when channel dims are too narrow for TP (parallel.shard_query_spatial).
    eval_mesh = None
    tp = max(1, args.tp)
    sp = max(1, getattr(args, 'sp', 0))
    if tp > 1 and sp > 1:
        raise SystemExit('--tp and --sp both shard the mesh "model" '
                         'axis — pick one latency mode')
    # under --dist every rank meshes its LOCAL devices only: eval needs
    # no cross-host collectives (params replicated, ranks own disjoint
    # chunks), so dp/tp/sp compose per host exactly as single-process
    local_devices = jax.local_devices()
    if (args.mGPUs or tp > 1 or sp > 1) and len(local_devices) > 1:
        from dana_tpu import parallel as par
        if tp > 1:
            eval_mesh = par.make_mesh_2d(local_devices, model=tp)
            params = par.shard_params_tp(params, eval_mesh)
        elif sp > 1:
            eval_mesh = par.make_mesh_2d(local_devices, model=sp)
            params = par.replicate(params, eval_mesh)
        else:
            eval_mesh = par.make_mesh(local_devices)
            params = par.replicate(params, eval_mesh)
        n_data = int(eval_mesh.devices.shape[0])
        eval_bs = max(eval_bs, n_data)
        eval_bs += (-eval_bs) % n_data        # divisible by the data axis
        print(f'parallel eval: data={n_data} x model={tp} x spatial={sp} '
              f'(bs {eval_bs})')

        _batch_sharding = jax.sharding.NamedSharding(
            eval_mesh, jax.sharding.PartitionSpec('data'))
    groups = {}
    for i in range(num_images):
        groups.setdefault(loader.bucket_of(i), []).append(i)

    all_boxes = [[[] for _ in range(num_images)]
                 for _ in range(imdb_.num_classes)]

    chunks = [idxs[s:s + eval_bs]
              for _, idxs in sorted(groups.items())
              for s in range(0, len(idxs), eval_bs)]
    rank, nproc = jax.process_index(), jax.process_count()
    if nproc > 1:
        # the chunk list is built deterministically (sorted bucket
        # groups) so it is identical on every rank — a strided split is
        # disjoint and covering, and interleaves buckets across ranks
        # (better compile reuse than contiguous blocks)
        chunks = chunks[rank::nproc]
        print(f'rank {rank}: {len(chunks)} of the chunks', flush=True)

    from dana_tpu.data import blob as blob_lib

    def assemble(chunk):
        """Host-side batch assembly (imread/resize/pad + optional stem
        space-to-depth packing) for one chunk — runs in the thread pool,
        overlapped with device compute."""
        pad = eval_bs - len(chunk)
        items = [loader[i] for i in chunk]
        keys = ('im_data', 'im_info') if use_sup_cache \
            else ('im_data', 'im_info', 'support_ims')
        batch = {k: np.stack([it[k] for it in items] +
                             [items[-1][k]] * pad)
                 for k in keys}
        if pack_s2d and batch['im_data'].shape[-1] == 3 \
                and batch['im_data'].shape[1] % 2 == 0 \
                and batch['im_data'].shape[2] % 2 == 0:
            # loader.pack_s2d already emitted 12-channel queries; this
            # branch only packs canvases a non-s2d loader produced (odd
            # custom canvases fall back to the direct 3-channel stem)
            batch['im_data'] = blob_lib.s2d_pack(
                batch['im_data'],
                u8_pad=blob_lib.u8_pad_of(loader.pixel_means))
        if pack_s2d and 'support_ims' in batch:
            # cached-support models never read batch supports — only
            # sibling frameworks (FSOD/meta/FGN) consume them here
            batch['support_ims'] = blob_lib.s2d_pack_any(
                batch['support_ims'])
        classes = [it['target_cls'] for it in items] \
            + [items[-1]['target_cls']] * pad
        return chunk, items, batch, classes

    # pipeline host decode against device compute: cv2/np release the
    # GIL, so a small thread pool keeps the next chunks assembling while
    # the TPU runs the current one (the reference loop is fully serial,
    # inference.py:88-105)
    from concurrent.futures import ThreadPoolExecutor
    # width scales with host cores like train.py's --nw cap: extra
    # threads on a 1-core host measured negative (PERF.md round-5
    # loader feed study, arm D), while multi-core hosts keep more
    # chunks assembling per device step
    eval_workers = max(2, min(8, os.cpu_count() or 1))
    pool_exec = ThreadPoolExecutor(max_workers=eval_workers)
    # each in-flight chunk buffers its full batch on the host (~200 MB
    # at bs8 608x1024 with supports), so the lookahead is capped rather
    # than scaled 2x with the worker count
    lookahead = min(eval_workers + 2, 8)
    pending = [pool_exec.submit(assemble, c) for c in chunks[:lookahead]]
    next_submit = lookahead

    t0 = time.time()
    n_done = 0

    def _to_device(batch, classes):
        if use_sup_cache:
            support_arg = batch_support_feats(classes)
        else:
            support_arg = jnp.asarray(batch['support_ims'])
        im_arg = jnp.asarray(batch['im_data'])
        info_arg = jnp.asarray(batch['im_info'])
        if eval_mesh is not None:
            if sp > 1:
                from dana_tpu import parallel as par
                im_arg = par.shard_query_spatial(im_arg, eval_mesh)
            else:
                im_arg = jax.device_put(im_arg, _batch_sharding)
            info_arg = jax.device_put(info_arg, _batch_sharding)
            support_arg = jax.tree.map(
                lambda x: jax.device_put(x, _batch_sharding),
                support_arg)
        return im_arg, info_arg, support_arg

    def _flush(entry):
        nonlocal n_done
        chunk, items, dets, valid = entry
        dets = np.asarray(dets)          # waits on THAT dispatch only
        valid = np.asarray(valid)
        for bi, img_idx in enumerate(chunk):
            cls = items[bi]['target_cls']
            all_boxes[int(cls)][img_idx] = dets[bi][valid[bi]]
        n_done += len(chunk)
        if n_done % (20 * eval_bs) < eval_bs:
            dt = time.time() - t0
            print(f'{n_done}/{num_images} imgs, '
                  f'{n_done / dt:.2f} img/s', flush=True)

    # one-deep software pipeline: dispatch chunk i's predict (async),
    # then ship chunk i+1 host->device BEFORE blocking on i's results —
    # overlapping H2D transfer + host assembly with device compute (the
    # reference loop serializes all three, inference.py:88-105)
    in_flight = None
    try:
        for ci in range(len(chunks)):
            chunk, items, batch, classes = pending[ci].result()
            pending[ci] = None     # release the decoded batch once consumed
            if next_submit < len(chunks):
                pending.append(pool_exec.submit(assemble,
                                                chunks[next_submit]))
                next_submit += 1
            dets, valid = predict(params, *_to_device(batch, classes))
            if in_flight is not None:
                _flush(in_flight)
            in_flight = (chunk, items, dets, valid)
        if in_flight is not None:
            _flush(in_flight)
            in_flight = None
    finally:
        # on any predict/assemble failure, cancel queued assembles so
        # decoded batches don't stay pinned in memory
        pool_exec.shutdown(wait=False, cancel_futures=True)

    out_dir = args.eval_dir or os.path.join(args.save_dir, 'eval')
    os.makedirs(out_dir, exist_ok=True)
    if nproc > 1:
        # per-rank partials on the (shared) eval dir; the chief merges
        # after the coordination-service barrier.  Cells are disjoint by
        # the chunk split, so the merge is an elementwise pick.
        part = os.path.join(out_dir, f'detections_rank{rank}.pkl')
        with open(part, 'wb') as f:
            pickle.dump(all_boxes, f)
        from dana_tpu.parallel.distributed import barrier
        # skew here is bounded by the WHOLE detection pass (a rank with a
        # cold compile cache can trail by far more than the default 600s);
        # a timeout sized to the pass itself, not to per-step skew
        barrier('eval_partials',
                timeout_ms=max(3_600_000, int(60_000 * len(chunks))))
        if rank != 0:
            return None
        for r in range(1, nproc):
            with open(os.path.join(out_dir,
                                   f'detections_rank{r}.pkl'), 'rb') as f:
                other = pickle.load(f)
            for c in range(len(all_boxes)):
                for i in range(num_images):
                    if len(other[c][i]):
                        all_boxes[c][i] = other[c][i]
    with open(os.path.join(out_dir, 'detections.pkl'), 'wb') as f:
        pickle.dump(all_boxes, f)
    print(f'total detect time {time.time() - t0:.1f}s '
          f'({num_images / (time.time() - t0):.2f} img/s)')
    result = imdb_.evaluate_detections(all_boxes, out_dir)
    return result


if __name__ == '__main__':
    main()
