#!/usr/bin/env python3
"""Inference/export entry point.

Usage parity with the reference (src/predict.py:90-103):

    python scripts/predict.py ckpt_path=<dir> [experiment=<name>] [a.b=v]

For each test scene: encode all frames, regress the TSDF volume, save
{scene}.npz + {scene}.ply to paths.output_dir (reference
VoxelNet.predict_step, voxel_net.py:354-384).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def resolve_model_cfg(cfg, snap, cli_model_overrides=None, cli_model_group=None):
    """Pick the effective model config for inference.

    Priority (reference save_hyperparameters / load_from_checkpoint
    contract + its **kwargs override surface):
      1. explicit CLI ``model=<group>`` reselection -> the composed
         cfg["model"] (already reflects the requested group);
      2. the checkpoint's config.json snapshot, with dotted CLI
         ``model.*`` overrides applied on top (``${...}`` interpolations
         resolved against the snapshot-grafted root, like compose());
      3. cfg["model"] when there is no snapshot.

    Returns (model_cfg, human-readable source description).
    """
    cli_model_overrides = cli_model_overrides or []
    model_cfg = cfg["model"]
    if snap is None:
        return model_cfg, "CLI (no snapshot)"
    if "model" not in snap:
        return model_cfg, "CLI (snapshot has no model key)"
    if cli_model_group is not None:
        # a bare model=<group> reselection wins over the snapshot (the same
        # contract as dotted model.* overrides); a pytree mismatch at
        # restore time then surfaces the incompatibility loudly instead of
        # the reselection being silently ignored
        return model_cfg, (
            f"CLI (model={cli_model_group} reselection overrides the "
            f"checkpoint snapshot)"
        )
    model_cfg = snap["model"]
    log_cfg_source = "checkpoint snapshot"
    if cli_model_overrides:
        from gennerf_tpu.utils.config import resolve_value, set_dotted

        # resolve ${...} interpolations like compose() would, with the
        # snapshot model grafted into the root so model-internal
        # references (e.g. model.x=${model.y}) see snapshot values
        root = dict(cfg)
        root["model"] = model_cfg
        for dotted, value in cli_model_overrides:
            set_dotted(model_cfg, dotted, resolve_value(value, root))
        log_cfg_source += (
            " + CLI override(s): "
            + ", ".join(d for d, _ in cli_model_overrides)
        )
    return model_cfg, log_cfg_source


def predict(cfg: dict, cli_model_overrides=None, cli_model_group=None):
    import jax

    from gennerf_tpu.data.datamodule import ScannetDataModule
    from gennerf_tpu.train import CheckpointManager, get_logger, make_task
    from gennerf_tpu.tsdf import TSDF

    log = get_logger()
    output_dir = cfg["paths"]["output_dir"]
    os.makedirs(output_dir, exist_ok=True)

    if not cfg.get("ckpt_path"):
        raise ValueError("ckpt_path is required for predict")

    # the checkpoint carries its model hyperparameters (reference
    # save_hyperparameters / load_from_checkpoint contract): prefer the
    # snapshot's model config so the restored pytree always matches
    precision = cfg.get("trainer", {}).get("precision")
    snap = None
    snap_path = os.path.join(cfg["ckpt_path"], "config.json")
    if os.path.exists(snap_path):
        import json

        snap = json.load(open(snap_path))
        # inference numerics follow the training precision unless the CLI
        # overrides it (reference load_from_checkpoint restores hparams)
        if precision is None:
            precision = snap.get("trainer", {}).get("precision")
    model_cfg, log_cfg_source = resolve_model_cfg(
        cfg, snap, cli_model_overrides, cli_model_group)

    task = make_task(model_cfg, precision=precision)
    log.info(f"model config source: {log_cfg_source}")
    datamodule = ScannetDataModule(cfg["data"], seed=cfg.get("seed") or 0)
    loader = datamodule.predict_dataloader()

    first = next(iter(loader))
    state = task.init_state(jax.random.PRNGKey(0), first)
    # when the training run monitored a metric, inference restores the BEST
    # checkpoint, not the last (the reference tests/predicts from
    # checkpoint_callback.best_model_path, src/train.py:101-108); the
    # monitor travels in the config snapshot
    ckpt_cfg = (snap or cfg).get("callbacks", {}).get("model_checkpoint", {}) or {}
    mgr = CheckpointManager(
        cfg["ckpt_path"],
        save_top_k=ckpt_cfg.get("save_top_k", -1),
        monitor=ckpt_cfg.get("monitor"),
        mode=ckpt_cfg.get("mode", "min"),
    )
    best = mgr.best_epoch()
    restored_epoch = best if best is not None else mgr.latest_epoch()
    if best is not None:
        state = mgr.restore_best(state)
        log.info(f"loaded BEST checkpoint (epoch {best}, "
                 f"monitor {ckpt_cfg.get('monitor')!r}) from {cfg['ckpt_path']}")
    else:
        state = mgr.restore(state)
        log.info(f"loaded checkpoint from {cfg['ckpt_path']}")
    import json

    with open(os.path.join(output_dir, "predict_meta.json"), "w") as f:
        json.dump({
            "ckpt_path": cfg["ckpt_path"],
            "epoch": restored_epoch,
            "selected_by": ckpt_cfg.get("monitor") if best is not None else "latest",
            "precision": precision,
        }, f, indent=2)

    for batch in loader:
        scene = batch["scene"][0]
        pred, _ = task.reconstruct(state, batch, b_idx=0)
        # apply the inference origin offset (reference voxel_net.py:376-382)
        offset = np.asarray(batch.get("offset", np.zeros((1, 1, 3))))[0].reshape(1, 3)
        pred = TSDF(pred.voxel_size, offset, pred.tsdf_vol)
        pred.save(os.path.join(output_dir, f"{scene}.npz"))
        mesh = pred.get_mesh()
        mesh.export(os.path.join(output_dir, f"{scene}.ply"))
        if len(mesh.vertices) == 0:
            # a fully saturated field (every voxel at +-1) has no
            # localizable zero crossing inside the truncation band — the
            # under-trained regime; eval will score F=0 on this scene
            log.warning(
                f"{scene}: extracted mesh is EMPTY (field saturated to "
                f"+-1? under-trained checkpoints do this before the "
                f"truncation ramp forms)"
            )
        log.info(f"saved {scene}.npz / {scene}.ply "
                 f"({len(mesh.vertices)} vertices)")
    log.info(f"output dir: {output_dir}")
    return output_dir


def main(argv=None):
    from gennerf_tpu.utils.config import compose

    argv = argv if argv is not None else sys.argv[1:]
    config_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
    cfg = compose(config_dir, "predict", argv)
    # honor trainer.accelerator like the train entry (reference predict
    # shares the trainer config group, src/predict.py:70-80): without this
    # the registered TPU plugin is always used, so trainer=cpu inference
    # (e.g. on a host without the accelerator) was impossible
    from gennerf_tpu.parallel.platform import select_platform

    select_platform(cfg.get("trainer", {}) or {})
    # pre-task utilities (reference src/predict.py:98 calls extras too)
    from gennerf_tpu.utils.console import extras

    extras(cfg)
    # explicit model.* CLI tokens override the checkpoint snapshot inside
    # predict() (reference load_from_checkpoint(**kwargs) surface)
    from gennerf_tpu.utils.config import parse_override

    cli_model_overrides = [
        (k.split(".", 1)[1], v)
        for k, v in (parse_override(t) for t in argv if "=" in t)
        if k.startswith("model.")
    ]
    # a whole-group reselection (model=<name>) must also win over the
    # snapshot, not be silently superseded by it
    cli_model_group = next(
        (v for k, v in (parse_override(t) for t in argv if "=" in t)
         if k == "model"), None)
    return predict(cfg, cli_model_overrides=cli_model_overrides,
                   cli_model_group=cli_model_group)


if __name__ == "__main__":
    main()
