"""CLI entrypoint (parity: trainer/cli.py:50-149 — `neurosis fit -c config.yaml`).

`python -m neurosis_tpu fit -c config.yaml` consumes the reference YAML shape:
trainer args, model (DiffusionEngine node), data (dataset module node).
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
    fit.add_argument("-c", "--config", required=True, type=Path)
    fit.add_argument("--max-steps", type=int, default=None)
    fit.add_argument("--fast-dev-run", action="store_true", default=None)
    args = parser.parse_args(argv)

    if args.command == "fit":
        return run_fit(args)
    return 1


def run_fit(args) -> int:
    from neurosis_tpu.config import instantiate, load_config
    from neurosis_tpu.trainer.builder import build_diffusion_engine
    from neurosis_tpu.trainer.loop import Trainer

    cfg = load_config(args.config)
    trainer_cfg = cfg.get("trainer", {}) or {}

    model_node = cfg["model"]
    cls_path = model_node.get("class_path", "")
    if "DiffusionEngine" in cls_path:
        engine = build_diffusion_engine(model_node)
    elif "Autoencod" in cls_path or "AutoencoderKL" in cls_path:
        from neurosis_tpu.trainer.builder import build_autoencoding_engine

        engine = build_autoencoding_engine(model_node)
    else:
        raise NotImplementedError(f"unsupported model class_path {cls_path}")

    data_node = cfg["data"]
    dataset = instantiate(data_node)

    fast_dev = trainer_cfg.get("fast_dev_run", False)
    if args.fast_dev_run is not None:
        fast_dev = args.fast_dev_run
    max_steps = args.max_steps or trainer_cfg.get("max_steps", 1000)

    callbacks = []
    if cfg.get("image_logger"):
        from neurosis_tpu.trainer.callbacks import ImageLogger

        il = dict(cfg["image_logger"])
        callbacks.append(
            ImageLogger(
                every_n_train_steps=il.get("every_n_train_steps", 100),
                max_images=il.get("max_images", 4),
                log_before_start=il.get("log_before_start", False),
            )
        )
    if cfg.get("model_checkpoint"):
        from neurosis_tpu.trainer.callbacks import CheckpointCallback

        mc = dict(cfg["model_checkpoint"])
        callbacks.append(CheckpointCallback(every_n_train_steps=mc.get("every_n_train_steps", 1000)))

    # distribution (Lightning trainer.devices/strategy → mesh axes; SURVEY §2.8):
    # `strategy: auto|ddp` = data-parallel over all devices; `strategy: fsdp`
    # additionally shards params/opt-state (fsdp axis = all devices unless an
    # explicit `fsdp:` size is given).
    devices = trainer_cfg.get("devices")
    strategy = str(trainer_cfg.get("strategy", "") or "")
    fsdp = int(trainer_cfg.get("fsdp", 0) or 0)
    if strategy in ("auto", "ddp", "fsdp") and devices is None:
        devices = "auto"
    if strategy == "fsdp" and fsdp == 0:
        import jax

        n = len(jax.devices()) if devices in ("auto", -1, None) else int(devices)
        fsdp = n
    fsdp = max(fsdp, 1)

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
    )

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
            from neurosis_tpu.data.prefetch import prefetch_batches

            yield from prefetch_batches(dataset, index_batches(), num_workers=num_workers)
        else:
            for idx_batch in index_batches():
                yield dataset.get_batch(idx_batch)

    state, frozen = trainer.fit(batches)
    logger.info(f"fit complete at step {int(state.step)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
