#!/usr/bin/env python3
"""Training entry point.

Usage parity with the reference (src/train.py:130-154):

    python scripts/train.py experiment=<name> [group=choice] [a.b.c=value]

Composes the layered config (configs/), instantiates datamodule + model
task + trainer, runs fit (and optionally test), writes checkpoints/metrics
under paths.output_dir.
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# platform selection lives in the package so every CLI (train, predict,
# eval) shares one implementation (gennerf_tpu/parallel/platform.py)
from gennerf_tpu.parallel.platform import select_platform  # noqa: E402


def train(cfg: dict):
    """Reference train() equivalent (src/train.py:45-127)."""
    select_platform(cfg.get("trainer", {}))
    # optional pre-task utilities: warnings filter, tag enforcement,
    # config-tree print + config_tree.log (reference src/train.py:139 ->
    # utils.extras); legacy top-level print_config=false still silences
    from gennerf_tpu.utils.console import extras

    if cfg.get("print_config") is False and cfg.get("extras"):
        cfg["extras"] = dict(cfg["extras"], print_config=False)
    extras(cfg)

    import jax

    from gennerf_tpu.data.datamodule import ScannetDataModule
    from gennerf_tpu.train import (
        CheckpointManager,
        MetricsLogger,
        Trainer,
        get_logger,
        make_task,
    )

    log = get_logger()
    seed = cfg.get("seed") or 0
    output_dir = cfg["paths"]["output_dir"]
    os.makedirs(output_dir, exist_ok=True)

    trainer_cfg = dict(cfg.get("trainer", {}))
    devices = trainer_cfg.get("devices", "auto")
    num_devices = len(jax.devices()) if devices in ("auto", None) else int(devices)
    if jax.process_count() > 1:
        # multi-process runtime: trainer.devices is LOCAL devices per
        # process; the data-parallel width (batch divisibility, mesh) is
        # the GLOBAL device count
        num_devices = jax.device_count()

    log.info(f"instantiating datamodule (dataset_type={cfg['data'].get('dataset_type')})")
    datamodule = ScannetDataModule(cfg["data"], num_devices=num_devices, seed=seed)

    precision = trainer_cfg.get("precision", "bf16-mixed")
    log.info(
        f"instantiating model <{cfg['model'].get('type')}> (precision={precision})"
    )
    task = make_task(cfg["model"], precision=precision,
                     gradient_clip_val=trainer_cfg.get("gradient_clip_val"))

    logger = MetricsLogger(output_dir, cfg.get("logger"))
    ckpt_cfg = (cfg.get("callbacks") or {}).get("model_checkpoint") or {}
    ckpt = CheckpointManager(
        ckpt_cfg.get("dirpath", os.path.join(output_dir, "checkpoints")),
        save_top_k=ckpt_cfg.get("save_top_k", -1),
        monitor=ckpt_cfg.get("monitor"),
        mode=ckpt_cfg.get("mode", "min"),
    )
    es = (cfg.get("callbacks") or {}).get("early_stopping") or {}
    # trainer_cfg takes precedence over the callbacks group if both specify
    # early-stopping keys (avoids a duplicate-kwarg crash on CLI overrides)
    es_kwargs = {
        "early_stopping_monitor": es.get("monitor"),
        "early_stopping_patience": es.get("patience", 3),
        "early_stopping_mode": es.get("mode", "min"),
    }
    es_kwargs.update({k: v for k, v in trainer_cfg.items() if k in es_kwargs})
    trainer_cfg = {k: v for k, v in trainer_cfg.items() if k not in es_kwargs}
    # remaining callback analogs (reference configs/callbacks/default.yaml
    # activates model_checkpoint + rich_progress_bar + clear_cache; the
    # model_summary group opts into a parameter table at fit start)
    cb = cfg.get("callbacks") or {}
    ms = cb.get("model_summary")
    cb_kwargs = {
        "model_summary_depth": (ms.get("max_depth", 1) if isinstance(ms, dict)
                                else (1 if ms else None)),
        "progress_bar": bool(cb.get("rich_progress_bar")),
        "clear_cache": bool(cb.get("clear_cache")),
    }
    trainer = Trainer(
        output_dir=output_dir, logger=logger, ckpt=ckpt, **cb_kwargs,
        **es_kwargs, **trainer_cfg,
    )

    state = None
    if cfg.get("train", True):
        log.info("starting training")
        state = trainer.fit(
            task, datamodule, seed=seed, ckpt_path=cfg.get("ckpt_path"),
            config_snapshot=cfg,
        )

    if getattr(trainer, "_preempted", False):
        # graceful preemption: checkpoint already saved by the fit loop;
        # skip the test phase and exit 0 so the scheduler sees a clean stop
        log.info(f"preempted: resume with ckpt_path={os.path.join(output_dir, 'checkpoints')}")
        return trainer.metrics, output_dir

    if cfg.get("test", False):
        log.info("starting testing")
        if state is None:
            state = trainer_restore_state(trainer, task, datamodule, cfg)
        elif ckpt.best_epoch() is not None:
            # a monitored ModelCheckpoint selects the BEST epoch for the
            # test pass, not the final state (reference src/train.py:101-108
            # tests with checkpoint_callback.best_model_path)
            state = ckpt.restore_best(state)
            log.info(f"testing with best checkpoint (epoch {ckpt.best_epoch()})")
        trainer.test(task, state, datamodule)

    log.info(f"output dir: {output_dir}")
    return trainer.metrics, output_dir


def trainer_restore_state(trainer, task, datamodule, cfg):
    from gennerf_tpu.train import CheckpointManager

    import jax

    first = next(iter(datamodule.val_dataloader()))
    state = task.init_state(jax.random.PRNGKey(0), first)
    ckpt_path = cfg.get("ckpt_path") or os.path.join(
        cfg["paths"]["output_dir"], "checkpoints"
    )
    return CheckpointManager(ckpt_path).restore(state)


def main(argv=None):
    from gennerf_tpu.utils.config import compose

    argv = argv if argv is not None else sys.argv[1:]
    config_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
    cfg = compose(config_dir, "train", argv)
    # hparams_search group (reference configs/train.yaml defaults list):
    # `train.py hparams_search=<name> ...` delegates the whole run to the
    # sweep runner over configs/hparams_search/<name>.yaml
    hs = cfg.get("hparams_search")
    if hs:
        import sweep as sweep_cli

        out = cfg["paths"]["output_dir"]
        passthrough = [a for a in argv if not a.startswith("hparams_search")]
        return sweep_cli.main(["--output", out, *passthrough], spec=hs)
    try:
        metrics, _ = train(cfg)
        return metrics
    except Exception:
        # reference task_wrapper: log the crash, re-raise (utils.py)
        traceback.print_exc()
        raise


if __name__ == "__main__":
    main()
