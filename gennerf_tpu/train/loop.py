"""Trainer: the fit/validate/test loop.

The harness-level replacement for Lightning's Trainer as the reference uses
it (SURVEY L5): epoch loop over jit'd steps, StepLR per epoch, periodic
validation with a reconstruction tail, every-epoch + last checkpoints,
scalar logging, resume. Device parallelism: batches are sharded over the
'data' mesh axis; everything inside the step is global-semantics jit.
"""
from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..parallel.mesh import make_hybrid_mesh, make_mesh, prefetch_shard, shard_batch
from .checkpoints import CheckpointManager
from .loggers import MetricsLogger, get_logger
from .state import TrainState, lr_for_epoch, set_learning_rate


class Trainer:
    def __init__(
        self,
        max_epochs: int = 10,
        min_epochs: int = 1,
        accelerator: str = "auto",
        devices: Any = "auto",
        precision: str = "bf16-mixed",
        log_every_n_steps: int = 50,
        check_val_every_n_epoch: int = 1,
        num_sanity_val_steps: int = 2,
        deterministic: bool = False,
        gradient_clip_val: Optional[float] = None,
        profile_dir: Optional[str] = None,
        profile_steps: int = 5,
        early_stopping_monitor: Optional[str] = None,
        early_stopping_patience: int = 3,
        early_stopping_mode: str = "min",
        prefetch_batches: int = 2,
        save_on_preempt: bool = True,
        model_summary_depth: Optional[int] = None,
        progress_bar: bool = False,
        clear_cache: bool = False,
        output_dir: str = ".",
        logger: Optional[MetricsLogger] = None,
        ckpt: Optional[CheckpointManager] = None,
        num_slices: Optional[int] = None,
        limit_train_batches: Optional[float] = None,
        limit_val_batches: Optional[float] = None,
        limit_test_batches: Optional[float] = None,
        # consumed by parallel.platform.select_platform before Trainer
        # construction; accepted here so the whole trainer config group can
        # be splatted through unchanged
        num_nodes: int = 1,
        coordinator_address: Optional[str] = None,
        node_rank: Optional[int] = None,
        **_unknown,
    ):
        self.max_epochs = max_epochs
        self.min_epochs = min_epochs
        self.log_every_n_steps = log_every_n_steps
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.num_sanity_val_steps = num_sanity_val_steps
        self.output_dir = output_dir
        self.log = get_logger()
        self.logger = logger or MetricsLogger(output_dir)
        self.ckpt = ckpt
        num_devices = None if devices in ("auto", None) else int(devices)
        if jax.process_count() > 1:
            # multi-process runtime: trainer.devices means LOCAL devices per
            # process (the reference's Lightning semantic); the mesh always
            # spans all global devices so jit programs stay global
            num_devices = None
        if num_slices and int(num_slices) > 1:
            # multi-slice pod: hybrid (slice, data) = (DCN, ICI) mesh;
            # batch shards over both axes (parallel.mesh.make_hybrid_mesh)
            if num_devices is not None and num_devices % int(num_slices):
                raise ValueError(
                    f"devices={num_devices} not divisible by num_slices={num_slices}"
                )
            per_slice = None if num_devices is None else num_devices // int(num_slices)
            self.mesh = make_hybrid_mesh(int(num_slices), per_slice)
        else:
            self.mesh = make_mesh(num_devices)
        self.precision = precision
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self.early_stopping_monitor = early_stopping_monitor
        self.early_stopping_patience = early_stopping_patience
        self.gradient_clip_val = gradient_clip_val
        if deterministic:
            # accepted for reference-config parity (Lightning
            # deterministic=True forces deterministic cuDNN kernels). Here
            # determinism is structural: jit programs are deterministic on
            # a fixed device topology, all randomness flows from the run
            # seed, and the loader draws per-item RNG independent of worker
            # scheduling — there is no nondeterministic kernel to disable.
            self.log.info(
                "trainer.deterministic=true: runs are already deterministic "
                "by construction (seeded PRNG + per-item loader RNG); no "
                "kernel switches needed"
            )
        if early_stopping_mode not in ("min", "max"):
            raise ValueError(f"early_stopping_mode must be 'min' or 'max', got {early_stopping_mode!r}")
        self.early_stopping_mode = early_stopping_mode
        # host/device overlap: background-thread decode + async device_put
        # of the next `prefetch_batches` batches while the step runs (0 =
        # synchronous; see parallel.mesh.prefetch_shard)
        self.prefetch_batches = int(prefetch_batches)
        # graceful preemption (cloud TPU / SLURM send SIGTERM with a grace
        # window): checkpoint at the next step boundary and exit cleanly so
        # `ckpt_path` resume continues the run. The reference has no
        # equivalent (SURVEY §5.3: recovery is manual resume only).
        self.save_on_preempt = bool(save_on_preempt)
        self._preempted = False
        # callback analogs (reference configs/callbacks/: RichModelSummary,
        # RichProgressBar, CudaClearCacheCallback — see train/callbacks.py)
        self.model_summary_depth = model_summary_depth
        self.clear_cache = bool(clear_cache)
        from .callbacks import ProgressBar

        self.progress = ProgressBar(enabled=bool(progress_bar))
        self.metrics: Dict[str, float] = {}
        # Lightning limit_{train,val,test}_batches: int = batch count,
        # float in (0, 1] = fraction of the loader (1.0 = everything)
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.limit_test_batches = limit_test_batches
        if _unknown:
            # a swallowed option is a config surface that lies (round-2's
            # dead trainer.precision) — at minimum, say so out loud
            self.log.warning(
                f"ignoring unknown trainer option(s): {sorted(_unknown)}"
            )

    def _batch_limit(self, limit, loader) -> Optional[int]:
        """Resolve a limit_*_batches value to a max batch count (None =
        unlimited). Lightning semantics: int = count, float = fraction of
        the loader (1.0 = everything)."""
        if limit is None:
            return None
        if isinstance(limit, int) and not isinstance(limit, bool):
            return limit
        limit = float(limit)
        if not 0.0 <= limit <= 1.0:
            raise ValueError(
                f"fractional batch limit must be in [0, 1], got {limit}"
            )
        if limit == 1.0:
            return None
        try:
            n = len(loader)
        except TypeError:
            self.log.warning(
                f"fractional batch limit {limit} needs a sized loader; "
                "running all batches"
            )
            return None
        import math

        return math.ceil(limit * n)

    # -----------------------------------------------------------------
    def fit(self, task, datamodule, seed: int = 0, ckpt_path: Optional[str] = None,
            config_snapshot: Optional[dict] = None):
        key = jax.random.PRNGKey(seed)
        # precision sanity: the model's compute dtype is fixed at task
        # construction (make_task(precision=...)); a mismatch with the
        # trainer's configured precision means the entry point didn't plumb
        # it through — surface that instead of silently training f32
        from .tasks import dtype_for_precision

        want = dtype_for_precision(self.precision)
        task_dtype = getattr(task, "dtype", None)
        if task_dtype is not None and task_dtype != want:
            self.log.warning(
                f"trainer.precision={self.precision!r} maps to {want} but the "
                f"task's model computes in {task_dtype}; pass precision= to "
                "make_task to train at the configured precision"
            )
        if self.gradient_clip_val and getattr(task, "gradient_clip_val", None) != self.gradient_clip_val:
            self.log.warning(
                f"trainer.gradient_clip_val={self.gradient_clip_val} but the "
                "task's optimizer was built without it; pass "
                "gradient_clip_val= to make_task to actually clip"
            )
        train_loader = datamodule.train_dataloader()
        val_loader = datamodule.val_dataloader()

        # init from the first batch's shapes
        try:
            first_batch = next(iter(train_loader))
        except StopIteration:
            raise ValueError(
                "train dataloader produced no batches — check the dataset "
                "windowing (e.g. data.sequence_length larger than the scene's "
                "frame count leaves zero sequences, and a fractional "
                "data.sequence_amount_train floors int(amount * n/seq_len) "
                "to zero windows when scenes are exactly one window long) "
                "and the split lists"
            ) from None
        key, k_init = jax.random.split(key)
        state = task.init_state(k_init, first_batch)
        from .state import param_count

        self.log.info(f"{task.name}: {param_count(state.params):,} params on "
                      f"{self.mesh.devices.size} device(s)")
        if self.model_summary_depth is not None and jax.process_index() == 0:
            from .callbacks import summarize_params

            self.log.info(
                "model summary:\n"
                + summarize_params(state.params, self.model_summary_depth)
            )
        if config_snapshot is not None:
            # reference log_hyperparameters (logging_utils.py:12-60): config
            # subtrees + param counts into every logger backend at fit start
            from .loggers import log_hyperparameters

            log_hyperparameters(config_snapshot, state.params, self.logger)

        start_epoch = 0
        if ckpt_path:
            mgr = CheckpointManager(ckpt_path)
            state = mgr.restore(state)
            start_epoch = (mgr.latest_epoch() or 0) + 1
            self.log.info(f"resumed from {ckpt_path} at epoch {start_epoch}")

        # sanity validation (reference trainer num_sanity_val_steps)
        if self.num_sanity_val_steps:
            for i, batch in enumerate(val_loader):
                if i >= self.num_sanity_val_steps:
                    break
                key, k = jax.random.split(key)
                task.run_eval_step(state, shard_batch(_arrays(batch), self.mesh), k)

        import signal
        import threading

        prev_sigterm = None
        if self.save_on_preempt and threading.current_thread() is threading.main_thread():
            def _on_sigterm(signum, frame):
                self._preempted = True
                self.log.info(
                    "SIGTERM: checkpointing at the next step boundary, then exiting"
                )

            prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)

        try:
            return self._fit_loop(task, key, state, start_epoch,
                                  train_loader, val_loader, config_snapshot)
        finally:
            if prev_sigterm is not None:
                signal.signal(signal.SIGTERM, prev_sigterm)

    def _fit_loop(self, task, key, state, start_epoch,
                  train_loader, val_loader, config_snapshot):
        global_step = int(state.step)
        best_monitor = None
        stale_epochs = 0
        stop = False
        batches_per_epoch = None
        if self.clear_cache:
            # reference on_train_start hook (clear_cache_cb.py): free dead
            # buffers before the loop, report what is actually live
            from .callbacks import clear_device_caches

            clear_device_caches(self.log, "train start")
        for epoch in range(start_epoch, self.max_epochs):
            lr = lr_for_epoch(task.cfg.optimizer, task.cfg.scheduler, epoch)
            state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))

            t_epoch = time.time()
            last_metrics = {}
            metrics = None
            train_limit = self._batch_limit(self.limit_train_batches, train_loader)
            self.progress.start_epoch(
                epoch,
                batches_per_epoch if train_limit is None
                else min(train_limit, batches_per_epoch or train_limit),
            )
            step_in_epoch = 0
            for batch, sharded in prefetch_shard(
                train_loader, self.mesh, self.prefetch_batches
            ):
                if train_limit is not None and step_in_epoch >= train_limit:
                    break
                key, k = jax.random.split(key)
                # optional profiler capture (reference §5.1: scoped
                # record_function annotations; here a real trace window)
                if self.profile_dir and global_step == 1:
                    jax.profiler.start_trace(self.profile_dir)
                state, metrics = task.run_train_step(state, sharded, k)
                if self.profile_dir and global_step == 1 + self.profile_steps:
                    jax.tree.map(
                        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                        metrics,
                    )
                    jax.profiler.stop_trace()
                    self.log.info(f"profiler trace written to {self.profile_dir}")
                global_step += 1
                step_in_epoch += 1
                if global_step % self.log_every_n_steps == 0:
                    last_metrics = {f"train_{k_}": float(v) for k_, v in metrics.items()}
                    self.logger.log_metrics({**last_metrics, "lr": lr, "epoch": epoch}, global_step)
                # progress line shows already-fetched host floats only (no
                # extra device sync on the step cadence)
                self.progress.update(step_in_epoch, last_metrics or None)
                if self._preempted:
                    break
            self.progress.end_epoch()
            batches_per_epoch = step_in_epoch or batches_per_epoch
            if self._preempted:
                if metrics is not None and self.ckpt is not None:
                    # the process exits right after: make the save durable
                    self.ckpt.save(epoch, state, config_snapshot, metrics=None,
                                   wait=True)
                    self.log.info(
                        f"preempted during epoch {epoch} (step {global_step}): "
                        "checkpoint saved; resume with ckpt_path= to continue "
                        f"at epoch {epoch + 1}"
                    )
                else:
                    # nothing completed this epoch, or fit() ran without a
                    # CheckpointManager — do not claim a save that never
                    # happened
                    self.log.info(
                        f"preempted during epoch {epoch} (step {global_step}): "
                        "no checkpoint written (no completed step or no "
                        "checkpoint manager)"
                    )
                return state
            dt = time.time() - t_epoch
            if metrics is None:
                raise RuntimeError(
                    "train dataloader produced no batches (epoch "
                    f"{epoch}); check the dataset split / batch size"
                )
            if not last_metrics:
                last_metrics = {f"train_{k_}": float(v) for k_, v in metrics.items()}
                self.logger.log_metrics({**last_metrics, "lr": lr, "epoch": epoch}, global_step)
            self.metrics.update(last_metrics)
            self.log.info(
                f"epoch {epoch}: " +
                ", ".join(f"{k_}={v:.4f}" for k_, v in last_metrics.items()) +
                f" ({dt:.1f}s)"
            )
            # masked-loss dead-signal guard: a *_coverage scalar at exactly
            # 0 means the matching masked term trained on NOTHING this
            # epoch while logging loss 0.0 (the round-4 distill drive ran
            # 59 such epochs unnoticed)
            for k_, v in last_metrics.items():
                if k_.endswith("_coverage") and v == 0.0:
                    self.log.warning(
                        f"{k_} == 0 at epoch {epoch}: the corresponding "
                        "masked loss term has ZERO support — it is training "
                        "on nothing (its logged loss of 0.0 is vacuous). "
                        "Check the teacher/validity masks."
                    )

            val_metrics = None
            if (epoch + 1) % self.check_val_every_n_epoch == 0:
                if self.clear_cache:
                    # reference on_validation_start / on_validation_end hooks
                    from .callbacks import clear_device_caches

                    clear_device_caches(self.log, "val start")
                val_metrics = self.validate(task, state, val_loader, key, epoch,
                                            reconstruct=True)
                if self.clear_cache:
                    from .callbacks import clear_device_caches

                    clear_device_caches(self.log, "val end")
                self.metrics.update(val_metrics)
                self.logger.log_metrics(val_metrics, global_step)

                # early stopping (reference callbacks/early_stopping.yaml;
                # disabled unless a monitor is configured)
                mon = self.early_stopping_monitor
                if mon and mon not in val_metrics:
                    self.log.warning(
                        f"early-stopping monitor {mon!r} not in validation "
                        f"metrics {sorted(val_metrics)} — callback inert this epoch"
                    )
                if mon and mon in val_metrics and epoch + 1 >= self.min_epochs:
                    value = val_metrics[mon]
                    sign = 1.0 if self.early_stopping_mode == "min" else -1.0
                    if best_monitor is None or sign * value < sign * best_monitor:
                        best_monitor = value
                        stale_epochs = 0
                    else:
                        stale_epochs += 1
                        if stale_epochs >= self.early_stopping_patience:
                            self.log.info(
                                f"early stopping: {mon} stale for "
                                f"{stale_epochs} validations (best {best_monitor:.5f})"
                            )
                            stop = True

            if self.ckpt is not None:
                # async: serialization overlaps the next epoch's steps
                self.ckpt.save(epoch, state, config_snapshot, metrics=val_metrics)
            if stop:
                break

        if self.ckpt is not None:
            self.ckpt.wait()
        return state

    # -----------------------------------------------------------------
    def validate(self, task, state: TrainState, loader, key, epoch: int = 0,
                 mode: str = "val", reconstruct: bool = False) -> Dict[str, float]:
        # accumulate ON DEVICE: a float() per metric per batch would
        # round-trip the host tunnel every batch (~50 ms RTT each on the
        # tunneled TPU); one fetch at the end instead
        sums: Dict[str, Any] = {}
        count = 0
        last_batch = None
        limit = self._batch_limit(
            self.limit_test_batches if mode == "test" else self.limit_val_batches,
            loader,
        )
        for batch, sharded in prefetch_shard(loader, self.mesh, self.prefetch_batches):
            if limit is not None and count >= limit:
                break
            key, k = jax.random.split(key)
            metrics = task.run_eval_step(state, sharded, k)
            for k_, v in metrics.items():
                sums[k_] = v if k_ not in sums else sums[k_] + v
            count += 1
            last_batch = batch
        out = {f"{mode}_{k_}": float(v) / max(count, 1) for k_, v in sums.items()}

        # reconstruction is process-local compute + file artifacts: rank 0
        # only under the multi-process runtime (reference rank-0-only
        # visualization, voxel_net.py:315)
        if reconstruct and last_batch is not None and jax.process_index() == 0:
            try:
                pred, trgt = task.reconstruct(state, last_batch, b_idx=0)
                self.logger.local.log_tsdf(pred, f"{mode}_tsdf/{mode}_pred_tsdf")
                mesh_pred = pred.get_mesh()
                # fan meshes/images to every capable backend (tfevents mesh
                # plugin + local .ply — the TensorBoardMeshLogger surface)
                self.logger.log_mesh(f"{mode}_mesh/{mode}_pred_mesh", mesh_pred, step=epoch)
                if trgt is not None:  # GT-less scenes log prediction only
                    l1 = float(np.abs(np.asarray(pred.tsdf_vol) - np.asarray(trgt.tsdf_vol)).mean())
                    out[f"{mode}_recon_tsdf_l1"] = l1
                    self.logger.local.log_tsdf(trgt, f"{mode}_tsdf/{mode}_trgt_tsdf")
                    mesh_trgt = trgt.get_mesh()
                    self.logger.log_mesh(f"{mode}_mesh/{mode}_trgt_mesh", mesh_trgt, step=epoch)
                    self._log_rendered_images(mesh_pred, mesh_trgt, last_batch, mode,
                                              step=epoch)
            except Exception as e:  # reconstruction is best-effort logging
                self.log.warning(f"reconstruction logging failed: {e}")
        return out

    def _log_rendered_images(self, mesh_pred, mesh_trgt, batch, mode: str,
                             b_idx: int = 0, num_logged_frames: int = 2,
                             step: int = 0):
        """Shaded target|prediction renders from the input views + an
        auto-framed overview (reference log_rendered_images,
        model.py:718-749), via the native rasterizer. Images fan out to
        the tfevents writer AND the local PNG sink."""
        from ..utils.visuals import compute_camera_pose, render_comparison

        image = batch["image"]  # (B, T, 3, H, W)
        H, W = image.shape[-2:]
        intr = np.asarray(batch["intrinsics"][b_idx])
        poses = np.asarray(batch["pose"][b_idx])
        overview = compute_camera_pose(mesh_trgt, intr[0], W, H)
        self.logger.log_image(
            f"{mode}_render/overview",
            render_comparison(mesh_pred, mesh_trgt, intr[0], overview, H, W),
            step=step,
        )
        for i in range(min(num_logged_frames, poses.shape[0])):
            self.logger.log_image(
                f"{mode}_render/frame{i}",
                render_comparison(mesh_pred, mesh_trgt, intr[i], poses[i], H, W),
                step=step,
            )

    def test(self, task, state: TrainState, datamodule, key=None) -> Dict[str, float]:
        key = key if key is not None else jax.random.PRNGKey(0)
        loader = datamodule.test_dataloader()
        metrics = self.validate(task, state, loader, key, mode="test", reconstruct=True)
        self.logger.log_metrics(metrics, int(state.step))
        return metrics


def _arrays(batch: Dict[str, Any]) -> Dict[str, Any]:
    return {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
