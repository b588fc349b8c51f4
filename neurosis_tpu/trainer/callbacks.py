"""Trainer callbacks (parity: trainer/callbacks/* — SURVEY.md §2.9, §5).

Hooks: on_fit_start(trainer, state), on_train_batch_end(trainer, state, frozen,
batch, metrics, step), on_fit_end(trainer, state).
"""

from __future__ import annotations

import logging
import time
from enum import Enum
from pathlib import Path
from typing import Any, Optional, Sequence

import jax
import numpy as np

logger = logging.getLogger(__name__)


class StepType(str, Enum):
    """Cadence source (trainer/common.py:10-34)."""

    global_step = "global_step"
    batch_idx = "batch_idx"
    global_batch = "global_batch"
    sample_idx = "sample_idx"


class EMATracker:
    """Scalar loss smoothing (trainer/util.py:59)."""

    def __init__(self, steps: int = 64):
        self.alpha = 2.0 / (steps + 1)
        self.value: Optional[float] = None

    def update(self, v: float) -> float:
        self.value = v if self.value is None else self.alpha * v + (1 - self.alpha) * self.value
        return self.value


class ImageLogger:
    """Periodic sample-grid logging (trainer/callbacks/image_logger.py:26-420).

    Saves local PNGs per split; samples via engine.sampler with CFG (cond/uncond
    from the batch), decodes with the frozen VAE.
    """

    def __init__(
        self,
        every_n_train_steps: int = 100,
        max_images: int = 4,
        num_steps: Optional[int] = None,
        log_before_start: bool = False,
        split: str = "train",
    ):
        self.every_n = every_n_train_steps
        self.max_images = max_images
        self.num_steps = num_steps
        self.log_before_start = log_before_start
        self.split = split
        self._sample_fn = None

    def on_train_batch_end(self, trainer, state, frozen, batch, metrics, step: int):
        if step % self.every_n != 0 and not (self.log_before_start and step == 1):
            return
        try:
            self._log_images(trainer, state, frozen, batch, step)
        except Exception:
            logger.exception("image logging failed")

    def _log_images(self, trainer, state, frozen, batch, step: int):
        from neurosis_tpu.utils.image import save_image_grid

        engine = trainer.engine
        if engine.sampler is None or engine.first_stage is None:
            return
        prepped = trainer.prepare_batch(batch)
        n = self.max_images
        prepped = {k: v[:n] if hasattr(v, "__getitem__") and not isinstance(v, str) else v for k, v in prepped.items()}

        params = {"params": trainer.engine._merged_cond_params(state.params, frozen)}
        c, uc = engine.conditioner.get_unconditional_conditioning(params, prepped)

        img = prepped[engine.input_key]
        shape = (img.shape[0], img.shape[1] // 8, img.shape[2] // 8, engine.model.in_channels)
        rng = jax.random.PRNGKey(step)
        latents = engine.sample(state.params, frozen, c, uc, rng, shape, num_steps=self.num_steps)
        decoded = engine.decode_first_stage(frozen, latents)

        captions = batch.get(trainer.caption_key)
        out_dir = Path(trainer.root_dir) / "images" / self.split
        save_image_grid(
            [np.asarray(decoded[i]) for i in range(decoded.shape[0])],
            out_dir / f"samples_gs-{step:06d}.png",
            captions=list(captions[: decoded.shape[0]]) if captions is not None else None,
            label=f"step {step}",
        )
        save_image_grid(
            [np.asarray(img[i]) for i in range(min(n, img.shape[0]))],
            out_dir / f"inputs_gs-{step:06d}.png",
            label=f"step {step}",
        )
        wb = getattr(trainer.logger, "wandb", None)
        if wb is not None:
            import wandb as _wandb

            wb.log(
                {f"{self.split}/samples": _wandb.Image(str(out_dir / f"samples_gs-{step:06d}.png"))},
                step=step,
            )
        logger.info(f"logged sample images at step {step} → {out_dir}")


def _state_payload(state) -> dict:
    """Full trainer state (the reference .ckpt carries optimizer/loop state)."""
    payload = {"params": state.params, "step": int(state.step)}
    if getattr(state, "opt_state", None) is not None:
        payload["opt_state"] = state.opt_state
    if getattr(state, "ema", None) is not None:
        payload["ema_params"] = state.ema.params
        payload["ema_num_updates"] = int(state.ema.num_updates)
    return payload


class CheckpointCallback:
    """State checkpointing (ModelCheckpoint + BlobCheckpointIO roles).

    Local dirs go through orbax; `dirpath` with an fsspec scheme
    (gs://, az://, s3://, memory://) goes through BlobCheckpointIO
    (checkpoint_io.py:17-62 semantics: buffer, write, never block training).
    """

    def __init__(
        self,
        dirpath: Optional[str] = None,
        every_n_train_steps: int = 1000,
        keep: int = 3,
        storage_options: Optional[dict] = None,
    ):
        self.dirpath = dirpath
        self.every_n = every_n_train_steps
        self.keep = keep
        self.storage_options = storage_options
        self._mgr = None
        self._blob = None

    def _is_remote(self) -> bool:
        from neurosis_tpu.checkpoint.blob import is_remote_url

        return is_remote_url(self.dirpath)

    def _blob_io(self):
        if self._blob is None:
            from neurosis_tpu.checkpoint.blob import BlobCheckpointIO

            self._blob = BlobCheckpointIO(self.dirpath, storage_options=self.storage_options)
        return self._blob

    def _manager(self, trainer):
        if self._mgr is None:
            import orbax.checkpoint as ocp

            path = Path(self.dirpath or (Path(trainer.root_dir) / "checkpoints")).absolute()
            path.mkdir(parents=True, exist_ok=True)
            self._mgr = ocp.CheckpointManager(
                path, options=ocp.CheckpointManagerOptions(max_to_keep=self.keep)
            )
        return self._mgr

    def on_train_batch_end(self, trainer, state, frozen, batch, metrics, step: int):
        if step % self.every_n != 0:
            return
        payload = _state_payload(state)
        if self._is_remote():
            blob = self._blob_io()
            blob.save_checkpoint(payload, step)
            blob.prune(self.keep)
        else:
            import orbax.checkpoint as ocp

            self._manager(trainer).save(step, args=ocp.args.StandardSave(payload))
        logger.info(f"saved checkpoint at step {step}")

    def on_fit_end(self, trainer, state):
        if self._mgr is not None:
            self._mgr.wait_until_finished()
        if self._blob is not None:
            self._blob.wait()


class DeviceStatsCallback:
    """Device memory logging (GPUMemoryUsage parity — trainer/callbacks/stats.py:78-118)."""

    def __init__(self, every_n_train_steps: int = 100):
        self.every_n = every_n_train_steps

    def on_train_batch_end(self, trainer, state, frozen, batch, metrics, step: int):
        if step % self.every_n != 0:
            return
        try:
            stats = jax.devices()[0].memory_stats() or {}
            used = stats.get("bytes_in_use", 0) / 2**30
            limit = stats.get("bytes_limit", 0) / 2**30
            trainer.logger.log({"device/mem_used_gib": used, "device/mem_limit_gib": limit}, step)
        except Exception:
            pass


class ModelSummaryCallback:
    """Print the layer/param summary table at fit start
    (lightning.pytorch.callbacks.ModelSummary / utils/summary/model.py role)."""

    def __init__(self, max_depth: int = 2, **_):
        self.max_depth = max_depth

    def on_fit_start(self, trainer, state):
        from neurosis_tpu.utils.summary import summarize

        try:
            logger.info("\n" + summarize(state.params, max_depth=self.max_depth))
        except Exception as e:  # pragma: no cover - summary is best-effort
            logger.debug(f"model summary failed: {e}")


class ProgressCallback:
    """Throughput + smoothed-loss console reporting (NeurosisProgressBar role)."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n
        self.ema = EMATracker()
        self._last_time = None
        self._last_step = 0

    def on_train_batch_end(self, trainer, state, frozen, batch, metrics, step: int):
        loss = float(metrics.get("loss", metrics.get("total", 0.0)))
        smoothed = self.ema.update(loss)
        if step % self.every_n != 0:
            return
        now = time.time()
        if self._last_time is not None:
            rate = (step - self._last_step) / max(now - self._last_time, 1e-9)
            logger.info(f"step {step} loss {loss:.4f} (ema {smoothed:.4f}) {rate:.2f} it/s")
        self._last_time = now
        self._last_step = step


class HFHubCheckpoint:
    """Push checkpoints to a HF Hub repo on a step cadence
    (trainer/callbacks/checkpoint.py:119-141 parity; non-blocking uploads)."""

    def __init__(
        self,
        repo_id: str,
        every_n_train_steps: int = 1000,
        private: bool = True,
        path_in_repo: str = "checkpoints",
    ):
        self.repo_id = repo_id
        self.every_n = every_n_train_steps
        self.private = private
        self.path_in_repo = path_in_repo
        self._futures = []

    def on_train_batch_end(self, trainer, state, frozen, batch, metrics, step: int):
        if step % self.every_n != 0:
            return
        try:
            from huggingface_hub import HfApi

            from neurosis_tpu.checkpoint.sgm import export_sgm_checkpoint

            path = Path(trainer.root_dir) / "hub" / f"step_{step:08d}.safetensors"
            path.parent.mkdir(parents=True, exist_ok=True)
            export_sgm_checkpoint(trainer.engine, state, frozen, path)
            api = HfApi()
            api.create_repo(self.repo_id, private=self.private, exist_ok=True)
            fut = api.upload_file(
                path_or_fileobj=str(path),
                path_in_repo=f"{self.path_in_repo}/{path.name}",
                repo_id=self.repo_id,
                run_as_future=True,  # non-blocking (checkpoint.py:141)
            )
            self._futures.append(fut)
            logger.info(f"HF hub upload queued: {self.repo_id}/{path.name}")
        except Exception:
            logger.exception("HF hub checkpoint upload failed")

    def on_fit_end(self, trainer, state):
        for fut in self._futures:
            try:
                fut.result(timeout=600)
            except Exception:
                logger.exception("pending HF upload failed")


class SaveConfigCallback:
    """Persist the resolved config next to the run (LoggerSaveConfigCallback
    parity, trainer/callbacks/wandb.py:15-34); uploads to wandb when active."""

    def __init__(self, config: Optional[dict] = None):
        self.config = config

    def on_fit_start(self, trainer, state):
        if not self.config:
            return
        import yaml

        path = Path(trainer.root_dir) / "config.yaml"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(yaml.safe_dump(self.config, sort_keys=False))
        wb = getattr(trainer.logger, "wandb", None)
        if wb is not None:
            wb.config.update({"resolved_config": self.config}, allow_val_change=True)
        logger.info(f"saved resolved config → {path}")
