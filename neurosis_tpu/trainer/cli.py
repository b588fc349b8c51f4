"""CLI entrypoint (parity: trainer/cli.py:50-149 — LightningCLI surface).

`python -m neurosis_tpu {fit,validate,predict} -c config.yaml` consumes the
reference YAML shape: trainer args, model (engine node), data (dataset node),
top-level image_logger / model_checkpoint nodes, trainer.logger (wandb
pass-through).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s")
    # some TPU plugins ignore the JAX_PLATFORMS env var; honor it via config
    # before any jax.devices() call (same workaround as tests/conftest.py)
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    parser = argparse.ArgumentParser(prog="neurosis_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    fit = sub.add_parser("fit", help="train from a YAML config")
    val = sub.add_parser("validate", help="run loss-only evaluation from a YAML config")
    tst = sub.add_parser("test", help="run loss-only evaluation on the test split (`data_test:` node, else `data:`)")
    pred = sub.add_parser("predict", help="sample images from prompts with a trained model")
    for p in (fit, val, tst, pred):
        p.add_argument("-c", "--config", required=True, type=Path)
    fit.add_argument("--max-steps", type=int, default=None)
    fit.add_argument("--fast-dev-run", action="store_true", default=None)
    val.add_argument("--max-batches", type=int, default=None)
    tst.add_argument("--max-batches", type=int, default=None)
    pred.add_argument("--prompt", action="append", default=None, help="repeatable prompt(s)")
    pred.add_argument("--steps", type=int, default=None, help="sampler steps override")
    pred.add_argument("--out", type=Path, default=None, help="output directory (default <root>/predictions)")
    pred.add_argument("--size", type=int, default=1024, help="image size (pixels, square)")
    args = parser.parse_args(argv)

    if args.command == "fit":
        return run_fit(args)
    if args.command == "validate":
        return run_validate(args)
    if args.command == "test":
        return run_test(args)
    if args.command == "predict":
        return run_predict(args)
    return 1


def _wandb_config(trainer_cfg: dict):
    """trainer.logger list → wandb init kwargs (WandbLogger pass-through)."""
    loggers = trainer_cfg.get("logger") or []
    if isinstance(loggers, dict):
        loggers = [loggers]
    for node in loggers:
        cls_path = str(node.get("class_path", ""))
        if cls_path.rsplit(".", 1)[-1] == "WandbLogger":
            ia = dict(node.get("init_args") or {})
            cfg = {k: v for k, v in ia.items() if k in ("project", "name", "tags", "entity", "group", "mode")}
            if ia.get("save_dir"):
                cfg["dir"] = ia["save_dir"]
            return cfg
    return None


def _mesh_args(trainer_cfg: dict):
    """Lightning trainer.devices/strategy → (devices, fsdp, context) mesh axes
    (SURVEY §2.8): `strategy: auto|ddp` = data-parallel over all devices;
    `strategy: fsdp` additionally shards params/opt-state (fsdp axis = all
    devices unless an explicit `fsdp:` size is given); `context_parallel: N`
    adds a ring-attention sequence axis (SURVEY §5.7, ops/ring_attention.py)."""
    devices = trainer_cfg.get("devices")
    strategy = str(trainer_cfg.get("strategy", "") or "")
    fsdp = int(trainer_cfg.get("fsdp", 0) or 0)
    context = int(trainer_cfg.get("context_parallel", 1) or 1)
    if (strategy in ("auto", "ddp", "fsdp") or context > 1) and devices is None:
        devices = "auto"
    if strategy == "fsdp" and fsdp == 0:
        import jax

        n = len(jax.devices()) if devices in ("auto", -1, None) else int(devices)
        fsdp = max(n // context, 1)
    return devices, max(fsdp, 1), context


def _build(args):
    """Shared setup: config → (cfg, engine, dataset, trainer)."""
    from neurosis_tpu.config import instantiate, load_config
    from neurosis_tpu.trainer.builder import build_engine
    from neurosis_tpu.trainer.loop import Trainer

    cfg = load_config(args.config)
    trainer_cfg = cfg.get("trainer", {}) or {}

    engine = build_engine(cfg["model"])
    if trainer_cfg.get("precision") is not None:
        from neurosis_tpu.trainer.builder import apply_precision

        engine = apply_precision(engine, trainer_cfg["precision"])
    dataset = instantiate(cfg["data"]) if "data" in cfg else None

    fast_dev = trainer_cfg.get("fast_dev_run", False)
    if getattr(args, "fast_dev_run", None) is not None:
        fast_dev = args.fast_dev_run
    max_steps = getattr(args, "max_steps", None) or trainer_cfg.get("max_steps", 1000)

    callbacks = []
    # trainer.callbacks list (Lightning class paths → our callbacks;
    # unknown entries warn and skip so reference configs run unmodified)
    for node in trainer_cfg.get("callbacks") or []:
        cp = (node.get("class_path") or "") if isinstance(node, dict) else str(node)
        ia = (node.get("init_args") or {}) if isinstance(node, dict) else {}
        if cp.endswith("DeviceStatsMonitor"):
            from neurosis_tpu.trainer.callbacks import DeviceStatsCallback

            callbacks.append(DeviceStatsCallback(every_n_train_steps=ia.get("every_n_train_steps", 100)))
        elif cp.endswith("ModelSummary"):
            from neurosis_tpu.trainer.callbacks import ModelSummaryCallback

            callbacks.append(ModelSummaryCallback(max_depth=ia.get("max_depth", 2)))
        elif cp.endswith("LearningRateMonitor"):
            pass  # LR is a pure step schedule here; logged with metrics
        else:
            try:
                from neurosis_tpu.config.registry import resolve_class_path

                callbacks.append(resolve_class_path(cp)(**ia))
            except Exception:
                logger.warning(f"skipping unsupported trainer callback {cp!r}")
    if trainer_cfg.get("profiler"):
        # Lightning `trainer.profiler:` arg (reference NeurosisProfiler,
        # trainer/profile/profiler.py) → our step-windowed jax.profiler
        # callback with module-name spans
        from neurosis_tpu.trainer.profile import NeurosisProfiler, ProfilerSchedule

        node = trainer_cfg["profiler"]
        ia = (node.get("init_args") or {}) if isinstance(node, dict) else {}
        sched = ia.get("schedule") or {}
        known = {k: sched[k] for k in ("skip_first", "wait", "warmup", "active", "repeat") if k in sched}
        callbacks.append(
            NeurosisProfiler(
                dirpath=ia.get("dirpath", "./profiles"),
                schedule=ProfilerSchedule(**known) if known else None,
                record_module_names=ia.get("record_module_names", True),
                capture_depth=ia.get("capture_depth", -1),
            )
        )
    if cfg.get("image_logger"):
        from neurosis_tpu.trainer.callbacks import ImageLogger

        il = dict(cfg["image_logger"])
        callbacks.append(
            ImageLogger(
                every_n_train_steps=il.get("every_n_train_steps", 100),
                max_images=il.get("max_images", 4),
                num_steps=(il.get("log_func_kwargs") or {}).get("num_steps"),
                log_before_start=il.get("log_before_start", False),
                log_first_step=il.get("log_first_step", False),
                log_step_type=il.get("log_step_type", "global_step"),
                batch_size=il.get("batch_size", 1),
                accumulate_grad_batches=il.get("accumulate_grad_batches", 1),
                clamp=il.get("clamp", True),
                rescale=il.get("rescale", True),
                extra_log_keys=il.get("extra_log_keys") or (),
                wandb_log_table=il.get("wandb_log_table", False),
            )
        )
    remote_ckpt_url = None
    if cfg.get("model_checkpoint"):
        from neurosis_tpu.checkpoint.blob import is_remote_url
        from neurosis_tpu.trainer.callbacks import CheckpointCallback

        mc = dict(cfg["model_checkpoint"])
        callbacks.append(
            CheckpointCallback(
                dirpath=mc.get("dirpath"),
                every_n_train_steps=mc.get("every_n_train_steps", 1000),
                keep=mc.get("save_top_k", mc.get("keep", 3)) or 3,
                storage_options=mc.get("storage_options"),
            )
        )
        if is_remote_url(mc.get("dirpath")):
            remote_ckpt_url = mc["dirpath"]

    devices, fsdp, context_parallel = _mesh_args(trainer_cfg)

    trainer = Trainer(
        engine,
        max_steps=max_steps,
        max_epochs=trainer_cfg.get("max_epochs"),
        log_every_n_steps=trainer_cfg.get("log_every_n_steps", 1),
        default_root_dir=trainer_cfg.get("default_root_dir", "./projects"),
        seed=cfg.get("seed_everything", 42),
        fast_dev_run=bool(fast_dev),
        callbacks=callbacks,
        loss_hooks=getattr(engine, "loss_hooks", ()),
        devices=devices,
        fsdp=fsdp,
        context_parallel=context_parallel,
        wandb_config=_wandb_config(trainer_cfg),
        remote_checkpoint_url=trainer_cfg.get("remote_checkpoint_url") or remote_ckpt_url,
        allow_random_weights=trainer_cfg.get("allow_random_weights", False),
        wandb_watch_steps=trainer_cfg.get("wandb_watch_steps", 0),
    )
    return cfg, engine, dataset, trainer


def _batch_factory(cfg, dataset):
    """Dataset → per-epoch batch iterable (rank-strided multi-host, optional
    process-pool prefetch)."""
    data_node = cfg.get("data") or {}
    num_workers = int((data_node.get("init_args") or {}).get("num_workers", 2) or 0)

    def index_batches():
        """Per-host schedule: rank-strided over pre-built bucket batches when
        running multi-host (AspectDistributedSampler contract, sampler.py:27-87)."""
        import jax

        if jax.process_count() > 1:
            from neurosis_tpu.data.sampler import shard_batches_for_host

            return iter(shard_batches_for_host(dataset, seed=cfg.get("seed_everything", 42)))
        return dataset.get_batch_iterator()

    def batches():
        if num_workers > 0:
            import os

            from neurosis_tpu.data.prefetch import make_prefetcher

            # worker processes by default (PIL decode holds the GIL; the
            # reference uses DataLoader worker processes too) — override with
            # NEUROSIS_PREFETCH=thread or data.init_args.prefetch_mode
            mode = os.environ.get("NEUROSIS_PREFETCH") or (
                (data_node.get("init_args") or {}).get("prefetch_mode", "process")
            )
            yield from make_prefetcher(mode)(dataset, index_batches(), num_workers=num_workers)
        else:
            for idx_batch in index_batches():
                yield dataset.get_batch(idx_batch)

    return batches


def run_fit(args) -> int:
    cfg, engine, dataset, trainer = _build(args)
    if dataset is None:
        raise ValueError("fit requires a `data:` node in the config")
    state, frozen = trainer.fit(_batch_factory(cfg, dataset))
    logger.info(f"fit complete at step {int(state.step)}")
    return 0


def run_validate(args) -> int:
    cfg, engine, dataset, trainer = _build(args)
    if dataset is None:
        raise ValueError("validate requires a `data:` node in the config")
    metrics = trainer.validate(_batch_factory(cfg, dataset), max_batches=args.max_batches)
    logger.info("validate: " + ", ".join(f"{k}={v:.5f}" for k, v in metrics.items()))
    print(__import__("json").dumps({"val/" + k: v for k, v in metrics.items()}))
    return 0


def run_test(args) -> int:
    """LightningCLI `test` analog: loss-only eval against the held-out split.

    Uses the `data_test:` config node when present (separate test dataset),
    falling back to `data:`; metrics are reported under `test/`.
    """
    from neurosis_tpu.config import instantiate

    cfg, engine, dataset, trainer = _build(args)
    if cfg.get("data_test"):
        dataset = instantiate(cfg["data_test"])
    if dataset is None:
        raise ValueError("test requires a `data_test:` or `data:` node in the config")
    metrics = trainer.validate(_batch_factory(cfg, dataset), max_batches=args.max_batches)
    logger.info("test: " + ", ".join(f"{k}={v:.5f}" for k, v in metrics.items()))
    print(__import__("json").dumps({"test/" + k: v for k, v in metrics.items()}))
    return 0


def run_predict(args) -> int:
    import numpy as np

    cfg, engine, dataset, trainer = _build(args)
    if engine.sampler is None:
        raise ValueError("predict requires a `sampler:` in the model config")
    prompts = args.prompt or ["a photograph of an astronaut riding a horse"]
    out_dir = args.out or (trainer.root_dir / "predictions")
    paths = trainer.predict(prompts, out_dir=out_dir, size=args.size, num_steps=args.steps)
    for p in paths:
        logger.info(f"wrote {p}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
