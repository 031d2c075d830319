"""Episodic training CLI.

Parity: /root/reference/train.py:24-190 — seeded setup, roidb + episodic
loader, SGD with bias lr-doubling, epoch loop with step lr decay, loss
logging every disp_interval, per-epoch checkpoints, --r resume restoring
lr and POOLING_MODE from the checkpoint (train.py:92-102).

TPU re-design: one jitted data-parallel train step over a `data` mesh
(replaces nn.DataParallel, train.py:104-105), static-bucket episodic
batches, background host prefetch.
"""

from __future__ import annotations

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from utils import parse_args, load_cfg, get_model


class PreemptionGuard:
    """SIGTERM/SIGINT-aware checkpoint trigger.

    TPU pods get preempted; the reference loses everything since its
    last per-epoch torch.save (train.py:183-189).  The guard flips a
    flag on the first signal (the training loop checkpoints and exits
    cleanly at the next step boundary) and restores default handling on
    the second so a stuck run can still be killed.
    """

    def __init__(self):
        self.requested = False
        self._prev = {}

    def install(self):
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handle)
            except ValueError:      # non-main thread (tests)
                pass
        return self

    def _handle(self, signum, frame):
        if self.requested:          # second signal: give up gracefully
            # a stored None means the prior handler was installed by
            # non-Python code; fall back to the default disposition
            signal.signal(signum,
                          self._prev.get(signum) or signal.SIG_DFL)
            raise KeyboardInterrupt
        self.requested = True
        print(f'signal {signum}: checkpointing at next step boundary',
              flush=True)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_cfg(args)
    np.random.seed(args.seed)

    import jax

    if args.dist:
        # multi-host pods: every host runs this CLI; initialize joins
        # them into one runtime BEFORE the first backend query
        from dana_tpu.parallel.distributed import init_distributed
        init_distributed(args.coordinator, args.num_procs, args.proc_id)
        print(f'distributed: process {jax.process_index()}/'
              f'{jax.process_count()}, '
              f'{len(jax.local_devices())} local devices '
              f'of {len(jax.devices())}', flush=True)
    is_chief = jax.process_index() == 0

    import jax.numpy as jnp
    from dana_tpu.data.imdb import combined_roidb
    from dana_tpu.data.fs_loader import (FewShotLoader, EpisodicBatcher,
                                         prefetch_to_device)
    from dana_tpu.engine import optim, train as train_engine
    from dana_tpu.models.layers import to_jnp
    from dana_tpu.utils import checkpoint as ckpt_lib

    imdb_, roidb, _, _ = combined_roidb(args.imdb_name,
                                        use_flipped=args.use_flip)
    print(f'{len(roidb)} roidb entries')

    if args.fewshot:
        # finetune flow (--fs): supports come from the directory pool
        # data/supports/<cls>/*.jpg instead of the crop DB, and only the
        # detection heads train — the protocol that produced the released
        # cisa_coco_ft30 checkpoint (reference finetune_loader.py:99-149
        # + FasterRCNN.finetune, faster_rcnn.py:192-204)
        from dana_tpu.data.fs_loader import FinetuneLoader
        sup_dir = (os.path.join(cfg.DATA_DIR, 'supports')
                   if args.sup_dir == 'all' else args.sup_dir)
        loader = FinetuneLoader(roidb, imdb_.num_classes,
                                imdb_.classes, sup_dir,
                                num_way=args.way, num_shot=args.shot,
                                max_num_box=cfg.MAX_NUM_GT_BOXES,
                                seed=args.seed)
    else:
        loader = FewShotLoader(roidb, imdb_.num_classes, num_way=args.way,
                               num_shot=args.shot,
                               max_num_box=cfg.MAX_NUM_GT_BOXES,
                               seed=args.seed)
    # under --dist each process materializes only its row block of every
    # (seed-deterministic, identical-on-all-ranks) global batch
    # --nw worker threads assemble episodes in parallel (the reference's
    # 8 DataLoader worker processes, train.py:57-59); content is
    # index-deterministic so worker count never changes the batches.
    # Capped at the host's core count: on a 1-core host thread switching
    # measured -14% feed rate with zero upside (PERF.md round-5 loader
    # feed study, arm D) — the cap degrades to the sequential path there
    # while multi-core hosts keep the reference's 8-way assembly.
    num_workers = min(args.num_workers, os.cpu_count() or 1)
    batcher = EpisodicBatcher(loader, args.batch_size, shuffle=True,
                              seed=args.seed,
                              process_id=jax.process_index(),
                              process_count=jax.process_count(),
                              num_workers=num_workers)

    config, params = get_model(args.net, way=args.way, shot=args.shot,
                               net=args.backbone, seed=args.seed)
    params = to_jnp(params)
    lr = args.lr

    start_epoch = args.start_epoch
    resume_opt = None
    if args.resume:
        path = args.checkpath or ckpt_lib.checkpoint_path(
            args.load_dir, args.checkepoch, args.checkpoint)
        if not os.path.exists(path):
            base, ext = os.path.splitext(path)
            for cand in (f'{base}_preempt{ext}', base + '.pth',
                         base + '_preempt.pth'):
                if os.path.exists(cand):
                    path = cand
                    break
        payload = ckpt_lib.load_checkpoint(path)
        params = to_jnp(payload['model'])
        lr = payload.get('lr') or lr
        start_epoch = payload.get('epoch', 0) + 1
        cfg.POOLING_MODE = payload.get('pooling_mode', cfg.POOLING_MODE)
        resume_opt = payload.get('optimizer')
        print(f'resumed from {path} (epoch {payload.get("epoch")})')

    trainable = optim.trainable_mask(params,
                                     fixed_blocks=cfg.RESNET.FIXED_BLOCKS)
    if args.fewshot:
        # heads-only finetuning (faster_rcnn.py:192-204 freezes everything
        # but the cls/bbox heads)
        trainable = jax.tree.map(lambda a, b: a and b, trainable,
                                 optim.finetune_mask(params))
    step_kw = dict(momentum=cfg.TRAIN.MOMENTUM,
                   weight_decay=cfg.TRAIN.WEIGHT_DECAY,
                   double_bias=cfg.TRAIN.DOUBLE_BIAS,
                   clip_norm=args.clip_norm
                   or (10.0 if args.backbone == 'vgg16' else 0.0),
                   model='DAnA' if args.net in ('res50', 'res101', 'vgg16')
                   else args.net)
    step_fn = train_engine.make_train_step(config, trainable, **step_kw)
    multi_fn = train_engine.make_multi_train_step(config, trainable,
                                                  **step_kw) \
        if args.steps_per_call > 1 else None
    state = train_engine.create_train_state(params, lr)
    if resume_opt is not None:
        # restore momentum velocity across resume (reference train.py:96-99
        # restores the full optimizer state dict)
        state = train_engine.restore_optimizer(state, resume_opt)
        print('restored optimizer state (momentum velocity)')

    mesh = None
    slices = max(0, getattr(args, 'slices', 0))
    if slices > 1 and len(jax.devices()) > 1:
        # two-level DP: batch shards over (slice x data); the gradient
        # all-reduce decomposes into ICI intra-slice + DCN cross-slice
        # (parallel.make_mesh_dcn)
        mesh = train_engine.make_mesh_dcn(slices)
        state = train_engine.replicate(state, mesh)
        print(f'multi-slice data-parallel: {slices} slices x '
              f'{mesh.devices.shape[1]} devices')
    elif args.mGPUs and len(jax.devices()) > 1:
        mesh = train_engine.make_mesh()
        state = train_engine.replicate(state, mesh)
        print(f'data-parallel over {len(jax.devices())} devices')
    if jax.process_count() > 1 and mesh is None:
        raise ValueError('--dist requires --mGPUs or --slices N: a '
                         'multi-process batch must shard over a device '
                         'mesh spanning all processes')

    logger = None
    if not args.dlog and is_chief:
        from dana_tpu.utils.fsod_logger import FSODLogger
        logger = FSODLogger(os.path.join(args.save_dir, 'tb'))

    # host-side stem space-to-depth packing (blob.s2d_pack): the device
    # stem becomes a 4x4/1 conv over 12 channels (PERF.md round 3)
    from dana_tpu.data import blob as blob_lib
    pack_s2d = bool(cfg.TPU.STEM_S2D) and args.backbone != 'vgg16'

    def _pack_batch_s2d(b):
        im = np.asarray(b['im_data'])
        if im.shape[1] % 2 or im.shape[2] % 2:
            return b      # odd custom canvas: direct 3-channel stem
        b = dict(b)
        b['im_data'] = blob_lib.s2d_pack(im)
        b['support_ims'] = blob_lib.s2d_pack_any(
            np.asarray(b['support_ims']))
        return b

    rng = jax.random.PRNGKey(args.seed)
    global_step = 0
    guard = PreemptionGuard().install()

    def stop_requested():
        # Multi-process: the signal may land on one host only (or at
        # different boundaries); vote so every rank stops at the SAME
        # step — a lone rank breaking out strands its peers inside the
        # gradient all-reduce (dana_tpu.parallel.distributed.agree_stop).
        if jax.process_count() > 1:
            from dana_tpu.parallel.distributed import agree_stop
            return agree_stop(guard.requested)
        return guard.requested

    for epoch in range(start_epoch, args.max_epochs + 1):
        # step lr decay — exact reference cadence: decay at every epoch
        # divisible by lr_decay_step+1 (reference train.py:118-120; step=10
        # decays at epochs 11, 22, 33, ...)
        if epoch % (args.lr_decay_step + 1) == 0:
            lr *= args.lr_decay_gamma
            state = state._replace(opt=state.opt._replace(
                lr=jnp.asarray(lr, jnp.float32)))
            print(f'lr decayed to {lr}')

        t0 = time.time()
        loss_acc = {}
        it = iter(batcher)
        if args.imlog:
            # remember the last RAW batch for the image-grid log below.
            # Do NOT draw a fresh `next(iter(batcher))` there: __iter__
            # advances the batcher's epoch counter, and under --dist the
            # logger exists on the chief only — a chief-only advance
            # desynchronizes the seed-deterministic batch index sequence
            # across ranks and silently corrupts every later epoch's
            # global batches.
            last_raw = {}

            def _remember(gen):
                for b in gen:
                    last_raw.clear()
                    last_raw.update(b)
                    yield b
            it = _remember(it)
        if pack_s2d:
            it = (_pack_batch_s2d(b) for b in it)
        if mesh is not None:
            it = (train_engine.shard_batch(b, mesh) for b in it)
        it = prefetch_to_device(it)
        steps = 0
        keys = ('im_data', 'im_info', 'gt_boxes', 'support_ims',
                'all_gt_boxes')

        def run_batches(iterator):
            """Yield (n_steps, metrics-mean) applying single or staged
            multi-step calls."""
            nonlocal state
            stage = []
            for b in iterator:
                b = {k: b[k] for k in keys if k in b}
                if args.steps_per_call <= 1:
                    state, m = step_fn(state, b, rng)
                    yield 1, m
                    continue
                stage.append(b)
                if len(stage) == args.steps_per_call:
                    stacked = {k: jnp.stack([s[k] for s in stage])
                               for k in stage[0]}
                    state, ms = multi_fn(state, stacked, rng)
                    stage = []
                    yield args.steps_per_call, \
                        {k: v.mean() for k, v in ms.items()}
            for b in stage:   # leftover tail, single steps
                state, m = step_fn(state, b, rng)
                yield 1, m

        trace_active = False
        preempted = False
        # Multi-process preemption votes are a blocking cross-host DCN
        # collective (process_allgather in agree_stop); vote only every
        # disp_interval loop iterations — the iteration sequence is
        # seed-deterministic and identical on every rank, so all ranks
        # reach each vote boundary together and none strands its peers
        # in the collective (advisor r4).  Single-process keeps the
        # per-iteration local-flag read (no collective, free).
        vote_every = (max(1, args.disp_interval)
                      if jax.process_count() > 1 else 1)
        it_count = 0
        for n, metrics in run_batches(it):
            it_count += 1
            if args.profile and global_step == 3:
                jax.profiler.start_trace(args.profile)
                trace_active = True
            if args.profile and global_step >= 8 and global_step - n < 8:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                trace_active = False
                print(f'profiler trace written to {args.profile}')
            steps += n
            global_step += n
            for k, v in metrics.items():
                loss_acc[k] = loss_acc.get(k, 0.0) + float(v) * n
            if steps % args.disp_interval == 0:
                dt = time.time() - t0
                msg = ', '.join(f'{k}: {loss_acc[k] / steps:.4f}'
                                for k in sorted(loss_acc) if 'loss' in k)
                print(f'[epoch {epoch:2d}][iter {steps:4d}] '
                      f'lr: {lr:.2e}, time/iter: {dt / steps:.3f}s, {msg}',
                      flush=True)
            if it_count % vote_every == 0 and stop_requested():
                # break AFTER accounting: the step that just ran is in
                # `state` and must be reflected in steps/metrics
                preempted = True
                break
        # epoch-boundary vote: bounds preemption latency to one epoch
        # even when the epoch is shorter than vote_every (all ranks exit
        # the loop together, so the collective is still synchronized).
        # The epoch itself completed, so the save below is a NORMAL
        # per-epoch checkpoint — only the exit is early.
        stop_after_epoch = not preempted and stop_requested()
        if trace_active:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            print(f'profiler trace written to {args.profile} (partial)')
        if steps == 0:
            if preempted or guard.requested:
                print('preempted before the first step; nothing new to '
                      'checkpoint — exiting')
                return None
            print('no batches; check dataset')
            break
        if logger is not None:
            # per-epoch scalars (+ query/support image grids with --imlog),
            # parity: FSODLogger.write (fsod_logger.py:37-102)
            sample = (dict(last_raw) or None) if args.imlog else None
            logger.write(epoch,
                         {k: loss_acc[k] / steps for k in loss_acc},
                         batch=sample, save_im=args.imlog)
        # a mid-epoch preemption checkpoint records the PREVIOUS epoch as
        # the last complete one, so --r re-runs the interrupted epoch
        # instead of silently skipping its remaining batches (the partial
        # updates it carries are simply trained over again)
        ckpt_epoch = epoch - 1 if preempted else epoch
        path = ckpt_lib.checkpoint_path(args.save_dir, ckpt_epoch,
                                        steps - 1)
        if preempted:
            # distinct name so a partial-epoch save can never clobber a
            # genuine completed-epoch checkpoint with the same indices
            base, ext = os.path.splitext(path)
            path = f'{base}_preempt{ext}'
        if is_chief:
            # params are replicated: rank 0 alone writes the checkpoint
            host_state = jax.device_get(state)
            path = ckpt_lib.save_checkpoint(
                path, host_state.params, host_state.opt, epoch=ckpt_epoch,
                step=steps - 1, lr=lr,
                pooling_mode=cfg.POOLING_MODE, backend=args.ckpt_backend)
            print(f'[epoch {epoch:2d}] saved {path} '
                  f'({time.time() - t0:.1f}s, {steps} iters)')
        if preempted or stop_after_epoch:
            # beyond the reference, which loses everything since its
            # last per-epoch save (train.py:183-189)
            print('preemption checkpoint written; exiting')
            return path


if __name__ == '__main__':
    main()
