"""Unified train/eval runner.

The one-engine replacement for the reference's six copy-pasted ~250-line
``main()``s (SURVEY.md §2.1 "shared main() skeleton"): build model +
optimizer + datasets from the config, create the data mesh, compile the
step functions once, run the epoch loop with rank-0 validation every 5
epochs (or >= 50) and best-mIoU checkpointing
(``main_avss_resize.py:205-219``, ``trainer_cavp_avss_image.py:377-381``).
"""

from __future__ import annotations

import random
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cavp_tpu.config.setups import Config
from cavp_tpu.data.pipeline import (
    DataLoader,
    collate_eval_videos,
    flatten_video_batch,
    repack_valid_frames,
)
from cavp_tpu.engine.checkpoint import Engine, load_model_variables
from cavp_tpu.engine.loops import (
    eval_metrics_init,
    eval_metrics_result,
    make_eval_step,
    make_jf_test_step,
    make_train_step,
)
from cavp_tpu.engine.optim import current_lrs, make_optimizer
from cavp_tpu.engine.state import create_train_state
from cavp_tpu.models import CAVP, VisualModel
from cavp_tpu.parallel import (
    create_hybrid_mesh,
    create_mesh,
    initialize_distributed,
    is_primary,
    replicate,
    shard_batch,
)
from cavp_tpu.utils import Tensorboard, logger, suppress_non_primary

# Remote-TPU compiles take minutes for the big conv towers (CLAUDE.md);
# every entry point funnels through this module, so set the persistent
# compile cache here — unless the caller (tests, bench) already chose one.
try:
    if jax.config.jax_compilation_cache_dir is None:
        from cavp_tpu.utils.hostfp import set_compile_cache
        set_compile_cache("/tmp/jax_tpu_cache")
except Exception:
    pass


def parse_compiler_options(config: Config) -> Optional[Dict[str, str]]:
    """--compiler_options "k=v,k=v" -> per-compile XLA options dict.
    TPU flags must ride this channel, not XLA_FLAGS (the client env
    parser aborts on TPU-only flags — docs/performance.md)."""
    raw = getattr(config, "compiler_options", "") or ""
    opts = {}
    for pair in raw.split(","):
        pair = pair.strip()
        if not pair:
            continue
        k, _, v = pair.partition("=")
        opts[k.strip()] = v.strip()
    return opts or None


def build_model(config: Config, baseline: bool = False):
    """main_avss_resize.py:92-116 model construction."""
    from cavp_tpu.ops import dilated as _dilated
    from cavp_tpu.ops import stride2 as _s2
    # trace-time gates: set before the model is jitted/traced
    _dilated.ENABLED = bool(getattr(config, "dilated_taps", True))
    _s2.ENABLED = bool(getattr(config, "s2_phase_bwd", False))
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    if baseline or config.use_baseline:
        return VisualModel(
            num_classes=config.num_classes,
            visual_backbone=config.visual_backbone,
            last_three_dilation_stride=tuple(config.last_three_dilation_stride),
            dtype=dtype)
    return CAVP(
        num_classes=config.num_classes,
        seg_model=config.seg_model,
        visual_backbone=config.visual_backbone,
        last_three_dilation_stride=tuple(config.last_three_dilation_stride),
        audio_backbone=config.audio_backbone,
        in_plane=config.in_plane,
        fusion_mlp_dedup=bool(getattr(config, "fusion_mlp_dedup", False)),
        dtype=dtype)


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def init_state(config: Config, model, tx, mesh):
    rng = jax.random.PRNGKey(config.seed)
    sample = {
        "image": jnp.zeros((1, config.image_height, config.image_width, 3),
                           jnp.float32),
        "audio": jnp.zeros((1, config.mel_frames, 64, config.in_plane),
                           jnp.float32),
    }
    state = create_train_state(model, tx, rng, sample, config)
    return replicate(state, mesh)


def count_params(params) -> float:
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)) / 1e6


def run_training(config: Config, variant: str, make_datasets: Callable,
                 ckpt_dir: str = "./checkpoints",
                 max_steps_per_epoch: Optional[int] = None,
                 eval_collate: Callable = collate_eval_videos,
                 eval_batch_size: int = 1,
                 profile_dir: Optional[str] = None,
                 preempt: Optional["PreemptionSignal"] = None):
    """The epoch loop. ``make_datasets(config) -> (train_ds, test_ds,
    train_collate)``. Returns (state, best_miou).

    Observability (SURVEY.md §5.1-2, absent in the reference): per-epoch
    step-time/throughput logging is built in; ``profile_dir`` captures a
    ``jax.profiler`` trace of steps 10-15 of the first epoch; ``--debug``
    turns on jax_debug_nans as the nan-guard equivalent of the
    reference's CoroCL asserts.
    """
    # graceful preemption: install FIRST — Cloud TPU SIGTERMs can land
    # during the (minutes-long) setup compiles; the flag is checked in
    # the step loop, which then writes the resumable checkpoint
    preempt = (preempt or PreemptionSignal()).install()
    initialize_distributed()
    suppress_non_primary(is_primary())
    seed_everything(config.seed)
    if config.debug:
        jax.config.update("jax_debug_nans", True)
    mesh = _make_mesh(config)

    # --batch_size is PER-WORKER exactly as in the reference: each of
    # the --gpus x --nodes DDP workers loads batch_size items (global
    # batch = B x world), which is what makes the reference's
    # lr *= gpus (main_avss.py:214, applied in flags.py) genuine linear
    # scaling. Here the global batch shards over the mesh and each host
    # process loads its share.
    global_batch = _global_batch(config)
    pc = max(jax.process_count(), 1)
    if global_batch % pc != 0:
        raise ValueError(
            f"global batch {global_batch} (batch_size x gpus x nodes) "
            f"must divide by the process count {pc} — each host process "
            f"loads an equal share")
    per_process = global_batch // pc

    train_ds, test_ds, train_collate = make_datasets(config)
    # one epoch = len / global_batch optimizer steps regardless of the
    # process count (each process iterates len/P items in per-process
    # chunks) — dividing by the per-process batch would stretch the LR
    # schedule and mis-place epoch resume by a factor of P
    steps_per_epoch = max(len(train_ds) // global_batch, 1)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    model = build_model(config)
    tx, schedule = make_optimizer(config, steps_per_epoch)
    state = init_state(config, model, tx, mesh)
    ckpt_path = getattr(config, "ckpt_path", "")
    start_epoch = 0
    resume_best_iou = 0.0
    if ckpt_path:
        state, ckpt_extra = _restore_into_state(state, ckpt_path, mesh,
                                                seg_model=config.seg_model)
        # resuming must not let a worse post-resume validation clobber
        # the saved best_model: restore the best metric too
        resume_best_iou = float(ckpt_extra.get("best_iou", 0.0))
        # resume the epoch counter too (reference persists 'epoch' in
        # the checkpoint, engine/engine.py:96): without it the loop
        # would replay epochs 0..N and re-disable the epoch>=1
        # overwrite/bank gates mid-training
        start_epoch = min(int(state.step) // steps_per_epoch,
                          config.epochs)
        logger.info("restored checkpoint %s (step %d, resuming at epoch %d)"
                    % (ckpt_path, int(state.step), start_epoch))
    logger.info("Number of trainable parameters: %.4fM"
                % count_params(state.params))

    if is_primary():
        wandb_ = Tensorboard(
            config, palette=select_display_palette(config),
            eval_list_path=getattr(config, "eval_list_path", ""))
    else:
        wandb_ = None
    engine = Engine(config, ckpt_dir)

    train_loader = DataLoader(
        train_ds, per_process, train_collate, shuffle=True,
        drop_last=True, num_workers=config.num_workers, seed=config.seed,
        process_index=jax.process_index(), process_count=jax.process_count())
    if eval_collate is collate_eval_videos and eval_batch_size == 1 and \
            config.resize_flag:
        # fixed eval resolution -> batch several videos per device step
        # (the reference is pinned to batch-1 by its per-frame loop)
        eval_batch_size = 8
    # process-sharded eval (disjoint strided shards; merged by a
    # cross-process sum in run_validation) — the reference forfeits this
    # by validating on rank 0 only (main_avss.py:199-202)
    test_loader = DataLoader(
        test_ds, eval_batch_size, eval_collate,
        num_workers=config.num_workers,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        pad_shards=False) if test_ds is not None else None
    if (test_ds is not None and getattr(config, "use_tfdata", False)
            and eval_collate is collate_eval_videos):
        # tf.data's parallel C++ decode runtime for the eval input
        # (--use_tfdata; the default thread-pool loader already uses the
        # native decoder for deterministic eval items)
        if config.resize_flag:
            from cavp_tpu.data.tfdata import TfEvalLoader
            test_loader = TfEvalLoader(test_ds, config,
                                       batch_videos=eval_batch_size)
        else:
            # the tf pipeline always resizes to the configured size;
            # native-resolution eval must keep the thread-pool loader
            logger.warning("--use_tfdata requires --resize_flag "
                           "(tf pipeline evaluates at the resized "
                           "resolution); using the thread-pool loader")

    if config.use_baseline:
        variant = "baseline"  # visual-only CE (main_avss_resize.py:92-104)
    train_step = jax.jit(make_train_step(model, tx, config, variant=variant),
                         donate_argnums=(0,),
                         compiler_options=parse_compiler_options(config))
    rng = jax.random.PRNGKey(config.seed + 1)

    best_iou = 0.0
    try:
        state, best_iou = _epoch_loop(
            config, model, state, mesh, engine, wandb_, train_loader,
            test_loader, train_step, schedule, rng, start_epoch,
            steps_per_epoch, max_steps_per_epoch, profile_dir,
            best_iou0=resume_best_iou, preempt=preempt)
    finally:
        preempt.uninstall()
        # join any in-flight async checkpoint write even when the loop
        # raised (NaN guard, preemption): the atomic swap means the last
        # good best_model is never lost, but the write must complete. If
        # we're already unwinding an exception, log instead of raising.
        import sys

        from cavp_tpu.engine.checkpoint import wait_for_saves

        wait_for_saves(raise_error=sys.exc_info()[0] is None)
    if wandb_:
        wandb_.finish()
    return state, best_iou


class PreemptionSignal:
    """SIGTERM/SIGINT-driven graceful preemption (SURVEY.md §5.3 — the
    reference has no failure handling at all). Cloud TPU preemptions and
    maintenance events deliver SIGTERM; the epoch loop checks the flag
    between steps and writes a resumable full-state checkpoint
    (``preempt``) before exiting, so ``--ckpt_path`` restart loses at
    most one step. Install only in the main thread; restores previous
    handlers on ``uninstall``."""

    def __init__(self):
        self.triggered = False
        self._prev = {}

    def install(self):
        import signal

        def _handler(signum, frame):
            if self.triggered and signum == signal.SIGINT:
                # second Ctrl-C escalates: the flag is only polled at
                # step boundaries, so a hung compile/transport call
                # would otherwise be un-abortable — restore the
                # previous handlers and raise immediately
                self.uninstall()
                raise KeyboardInterrupt
            self.triggered = True
            logger.warning(
                "caught signal %d: will checkpoint + exit at the next "
                "step boundary (Ctrl-C again forces immediate abort)"
                % signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, _handler)
            except ValueError:  # not the main thread (tests, servers)
                pass
        return self

    def uninstall(self):
        import signal

        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except ValueError:
                pass
        self._prev = {}


class PreemptedError(RuntimeError):
    """Raised after the preemption checkpoint is safely written."""


def _epoch_loop(config, model, state, mesh, engine, wandb_, train_loader,
                test_loader, train_step, schedule, rng, start_epoch,
                steps_per_epoch, max_steps_per_epoch, profile_dir,
                best_iou0: float = 0.0, preempt: "PreemptionSignal" = None):
    best_iou = best_iou0
    step_no = int(state.step)

    def _emit(pending):
        """Materialize + upload a PREVIOUS step's metrics. Reading the
        just-dispatched step's values would block async dispatch every
        iteration (display_iter defaults to 1 for reference CLI parity);
        by the next display point the values are long since computed,
        so this one-step-lagged read costs nothing."""
        s, pm = pending
        m = {k: float(v) for k, v in pm.items()}
        m.update({k: float(v) for k, v in
                  current_lrs(schedule, config, s).items()})
        if wandb_:
            wandb_.upload_metrics(m, step=s)

    for epoch in range(start_epoch, config.epochs):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        n = 0
        pending = None
        for batch_idx, batch in enumerate(train_loader):
            if max_steps_per_epoch and batch_idx >= max_steps_per_epoch:
                break
            if profile_dir and epoch == 0 and batch_idx == 10:
                jax.profiler.start_trace(profile_dir)
            if preempt is not None and preempt.triggered:
                logger.warning("preemption signal: writing resumable "
                               "checkpoint before exit")
                engine.save(state, "preempt", blocking=True,
                            extra_metrics={"best_iou": best_iou})
                raise PreemptedError(
                    f"preempted at epoch {epoch} step {step_no}; resume "
                    f"with --ckpt_path {engine.ckpt_dir}/preempt")
            batch.pop("name", None)
            batch = shard_batch(batch, mesh)
            state, metrics = train_step(state, batch, rng,
                                        jnp.asarray(epoch))
            step_no += 1
            if profile_dir and epoch == 0 and batch_idx == 15:
                jax.block_until_ready(metrics["loss/loss"])
                jax.profiler.stop_trace()
            engine.update_iteration(epoch, epoch * steps_per_epoch + batch_idx)
            n += 1
            if is_primary() and batch_idx % config.display_iter == 0:
                if pending is not None:
                    _emit(pending)
                pending = (step_no, metrics)
        if is_primary() and pending is not None:
            _emit(pending)  # flush the last window at the epoch barrier
        dt = time.time() - t0
        per_proc = _global_batch(config) // max(jax.process_count(), 1)
        logger.info(
            f"epoch {epoch}: {n} steps in {dt:.1f}s "
            f"({n * per_proc / max(dt, 1e-9):.2f} img/s this process)")

        if test_loader is not None and (epoch % 5 == 0 or epoch >= 50):
            # every process evaluates its shard; metrics merge inside
            results = run_validation(config, model, state, test_loader, mesh,
                                     wandb_=wandb_)
            if is_primary():
                logger.info(
                    "|ALL| mIoU: %.4f | acc: %.4f | fdr: %.4f | f_1: %.4f | "
                    "f_0.3: %.4f" % (results["miou"], results["acc"],
                                     results["fdr"], results["f_1"],
                                     results["f_0.3"]))
            if results["miou"] > best_iou:
                best_iou = results["miou"]
                if is_primary():
                    if wandb_:
                        for k, v in results.items():
                            wandb_.set_summary(f"best_{k}", v)
                    if not config.ignore_ckpt:
                        # async write: training rolls into the next epoch
                        # while orbax serializes (D2H already done)
                        engine.save(state, "best_model", blocking=False,
                                    extra_metrics={"best_iou": best_iou})
            if wandb_:
                wandb_.upload_metrics(results, step=int(state.step))
    return state, best_iou


def _restore_into_state(state, ckpt_path: str, mesh,
                        seg_model: str = "DeepLabV3Plus"):
    """Resume: orbax checkpoints restore the full train state (params,
    opt_state, step, sound_bank — preemption recovery the reference
    lacks, SURVEY.md §5.3); torch .pth restores model variables only.
    Returns (state, extra) where extra carries the saved run metadata
    (epoch/iteration/best_iou)."""
    if ckpt_path.endswith((".pth", ".pt")):
        params, batch_stats, report = load_model_variables(
            ckpt_path, state.params, state.batch_stats, seg_model=seg_model)
        if report["unexpected"]:
            logger.warning("unconverted torch keys: %s"
                           % report["unexpected"][:10])
        return state.replace(params=replicate(params, mesh),
                             batch_stats=replicate(batch_stats, mesh)), {}
    from cavp_tpu.engine.checkpoint import restore_checkpoint

    payload = restore_checkpoint(ckpt_path)
    new = state.replace(
        step=jnp.asarray(payload["step"], jnp.int32),
        params=replicate(payload["params"], mesh),
        batch_stats=replicate(payload["batch_stats"], mesh),
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            jax.tree_util.tree_leaves(payload["opt_state"])),
    )
    if "sound_bank" in payload and state.sound_bank is not None:
        new = new.replace(sound_bank=replicate(payload["sound_bank"], mesh))
    return new, dict(payload.get("extra") or {})


def select_display_palette(config):
    """The logger palette the reference effectively uses: AVSS-family
    entries override Tensorboard's palette with the dataset's 71-class
    v2 palette — even avss_binary (main_avss_resize.py:160
    ``wandb_.pallete = train_dataset.dataset_v.pallete``,
    visual_dataset.py:73 with NUM_CLASSES=71); VPO entries keep
    ``tensor_board.get_pallete(num_classes)``."""
    from cavp_tpu.utils.wandb_logger import get_display_palette

    if config.setup.startswith("avss"):
        from cavp_tpu.data.avss import get_v2_palette

        return get_v2_palette(71)
    return get_display_palette(max(config.num_classes, 2))


def _global_batch(config: Config) -> int:
    """batch_size x gpus x nodes — the reference's global batch (one
    per-worker batch per DDP process)."""
    return config.batch_size * max(config.gpus, 1) * max(config.nodes, 1)


def _make_mesh(config: Config):
    """--gpus selects the data-parallel width (reference: process count);
    clamped to available devices and to the largest divisor of the
    GLOBAL batch that fits (gcd would silently under-select: gcd(6,8)=2
    wastes 2 of 6 requested devices where 4 fit, largest-divisor picks
    them). Multi-slice: --nodes > 1 (the reference's world-size
    multiplier, main_avss.py:216) or devices spanning several
    ``slice_index`` groups select the hierarchical (dcn, ici) mesh so
    gradient collectives reduce over ICI before crossing DCN."""
    devices = jax.devices()
    n = min(config.gpus * max(config.nodes, 1), len(devices))
    n = max(n, 1)
    target = _global_batch(config)
    n = max(d for d in range(1, n + 1) if target % d == 0)
    slice_ids = {getattr(d, "slice_index", None) for d in devices[:n]}
    want_slices = config.nodes if config.nodes > 1 else len(
        slice_ids - {None})
    if want_slices > 1 and n % want_slices == 0:
        try:
            return create_hybrid_mesh(num_slices=want_slices,
                                      devices=devices[:n])
        except ValueError as e:
            # e.g. the devices[:n] prefix spans slices unevenly — a
            # reshaped "hybrid" mesh would route intra-slice collectives
            # over DCN, slower than plain data parallelism
            logger.warning(f"hybrid mesh unavailable ({e}); using the "
                           f"flat {n}-device mesh")
    return create_mesh(num_devices=n)


def run_validation(config: Config, model, state, test_loader, mesh=None,
                   wandb_=None) -> Dict[str, float]:
    """trainer.validation rebuilt: batched padded videos, carried device
    metrics, one host sync at the end. ``wandb_`` (a Tensorboard with an
    ``eval_list``) enables the reference's whitelisted per-video image
    uploads (trainer_cavp_avss_image.py:59-60,449-463).

    Multi-host: evaluation runs on each process's LOCAL device mesh over
    its disjoint shard — no cross-process lockstep, so unequal shard
    sizes/batch counts are fine — and the metric sums merge once at the
    end. (A global-mesh eval would deadlock the moment shards are
    uneven: every jitted call is a collective all processes must join.)
    """
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if jax.process_count() > 1:
        from cavp_tpu.parallel import local_mesh, localize_replicated

        mesh = local_mesh()
        variables = localize_replicated(variables)
    else:
        mesh = mesh or _make_mesh(config)
    eval_step = jax.jit(make_eval_step(model, config),
                        compiler_options=parse_compiler_options(config))
    metrics = eval_metrics_init(config.num_classes)
    n_dev = mesh.devices.size
    upload_names = set(wandb_.eval_list) if (
        wandb_ is not None and wandb_.eval_list) else set()
    upload_fwd = jax.jit(
        lambda v, img, aud: model.apply(v, img, aud, True)[0]
    ) if upload_names else None
    def flat_batches():
        for batch in test_loader:
            names = batch.pop("name", None)
            batch.pop("img_label", None)
            batch.pop("frame_available", None)
            if upload_names and names:
                _upload_whitelisted(config, upload_fwd, variables, batch,
                                    names, upload_names, wandb_)
            if batch["image"].ndim == 5:  # padded videos -> flat frames
                batch = flatten_video_batch(batch)
            yield batch

    stream = flat_batches()
    if getattr(config, "eval_dense_pack", True):
        # drop padding frames (v1 videos fill 5 of 10 slots) and re-emit
        # dense fixed-size batches — metric sums are unchanged, the dead
        # forward passes are skipped (data/pipeline.py)
        stream = repack_valid_frames(stream)
    for batch in stream:
        batch = _pad_to_devices(batch, n_dev)
        flat = shard_batch(batch, mesh)
        metrics = eval_step(variables, metrics, flat)
    # merge the per-process shard accumulators (all metric states are
    # sums: MIoU inter/union histograms, FG confusion matrices) — the
    # TPU-native all_gather_object merge (engine/utils.py:341-374)
    from cavp_tpu.parallel import allsum_across_processes

    metrics = jax.tree_util.tree_map(np.asarray, metrics)
    metrics = allsum_across_processes(metrics)
    return {k: float(v) for k, v in eval_metrics_result(metrics).items()}


def _upload_whitelisted(config, upload_fwd, variables, batch, names,
                        upload_names, wandb_):
    """Per-video image upload for eval_list.txt uids: forward the
    whitelisted video's frames (static [T] shape — one compile, cached
    across videos and validation gates) and log colorized GT/pred for
    the valid ones (trainer_cavp_avss_image.py:449-463)."""
    from cavp_tpu.engine.loops import preprocess_audio

    sel = [i for i, n in enumerate(names) if n in upload_names]
    if not sel:
        return
    for i in sel:
        img = batch["image"][i]
        wave = batch["waveform"][i]
        gt = batch["pix_label"][i]
        valid = batch.get("valid")
        if img.ndim == 3:  # single-frame item
            img, wave, gt = img[None], wave[None], gt[None]
            keep = np.array([0])
        else:
            v = np.asarray(valid[i]) if valid is not None else np.ones(
                img.shape[0])
            keep = np.nonzero(v > 0)[0]
        audio = preprocess_audio(jnp.asarray(wave),
                                 n_frames=config.mel_frames,
                                 spec_min=config.spec_min,
                                 spec_max=config.spec_max)
        logits = np.asarray(upload_fwd(variables, jnp.asarray(img), audio))
        wandb_.upload_wandb_image(img[keep], gt[keep], logits[keep],
                                  None, status="val", caption=names[i])


def _pad_to_devices(batch: Dict, n_dev: int) -> Dict:
    """Zero-pad the leading (frame) axis to a multiple of the mesh size;
    padded frames carry valid=0 so metrics are unaffected."""
    n = batch["image"].shape[0]
    rem = (-n) % n_dev
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        pad_width = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad_width)
    return out


def run_jf_test(config: Config, model, state, test_loader) -> Dict[str, float]:
    """test_avss_resize.py J&F eval: per-video mask_iou + F-measure
    averaged with AverageMeter semantics (trainer_cavp_avs_obj.py:346-353)."""
    jf_step = jax.jit(make_jf_test_step(model, config),
                      compiler_options=parse_compiler_options(config))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mious, fscores = [], []
    for batch in test_loader:
        batch.pop("name", None)
        batch.pop("img_label", None)
        batch.pop("frame_available", None)
        miou, fscore = jf_step(variables, batch)
        mious.extend(np.atleast_1d(np.asarray(miou)).tolist())
        fscores.extend(np.atleast_1d(np.asarray(fscore)).tolist())
    return {
        "miou": float(np.mean(mious)),
        "F_score": float(np.mean(fscores)),
        "J&F": float((np.mean(mious) + np.mean(fscores)) / 2),
    }
