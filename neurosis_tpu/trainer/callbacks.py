"""Trainer callbacks (parity: trainer/callbacks/* — SURVEY.md §2.9, §5).

Hooks: on_fit_start(trainer, state), on_train_batch_end(trainer, state, frozen,
batch, metrics, step), on_fit_end(trainer, state).
"""

from __future__ import annotations

import logging
import time
from enum import Enum
from pathlib import Path
from typing import Optional, Sequence

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
    """Periodic sample/recon-grid logging (trainer/callbacks/image_logger.py:26-420).

    - cadence is StepType-driven (`get_step_idx`/`check_step_idx` parity,
      image_logger.py:98-126: global_step/batch_idx/global_batch/sample_idx,
      log_first_step, never-log-the-same-step-twice);
    - diffusion engines: samples via engine.sampler with CFG **under the EMA
      scope** when the engine trains one (models/diffusion.py:413), decodes
      with the frozen VAE;
    - VAE engines (no sampler): drives `engine.log_images` →
      inputs/recons/diff/diff_boost (+_ema, + disc-logit grids);
    - writes per-split rank-suffixed PNGs `gs…_e…_b…_<key>` plus a caption
      grid, and mirrors everything to wandb (optional table).
    """

    def __init__(
        self,
        every_n_train_steps: int = 100,
        max_images: int = 4,
        num_steps: Optional[int] = None,
        log_before_start: bool = False,
        log_first_step: bool = False,
        log_step_type: StepType = StepType.global_step,
        batch_size: int = 1,
        accumulate_grad_batches: int = 1,
        clamp: bool = True,
        rescale: bool = True,
        extra_log_keys: Sequence[str] = (),
        wandb_log_table: bool = False,
        split: str = "train",
    ):
        self.every_n = every_n_train_steps
        self.max_images = max_images
        self.num_steps = num_steps
        self.log_before_start = log_before_start
        self.log_first_step = log_first_step
        self.log_step_type = StepType(log_step_type)
        self.batch_size = batch_size
        self.accumulate_grad_batches = accumulate_grad_batches
        self.clamp = clamp
        self.rescale = rescale
        self.extra_log_keys = list(extra_log_keys)
        self.wandb_log_table = wandb_log_table
        self.split = split
        self._last_logged = -1

    # -- cadence (image_logger.py:98-126) ----------------------------------

    def get_step_idx(self, global_step: int, batch_idx: int) -> int:
        if self.log_step_type == StepType.global_step:
            return global_step
        if self.log_step_type == StepType.batch_idx:
            return batch_idx
        if self.log_step_type == StepType.global_batch:
            return batch_idx * self.accumulate_grad_batches
        if self.log_step_type == StepType.sample_idx:
            return batch_idx * self.accumulate_grad_batches * self.batch_size
        raise ValueError(f"invalid log_step_type: {self.log_step_type}")

    def check_step_idx(self, global_step: int, batch_idx: int, before_start: bool = False) -> bool:
        step_idx = self.get_step_idx(global_step, batch_idx)
        if step_idx <= self._last_logged:
            return False
        if step_idx == 0 and before_start:
            return self.log_before_start
        if step_idx == 1:
            return self.log_first_step
        return (step_idx % self.every_n) == 0

    # -- hooks --------------------------------------------------------------

    def on_train_batch_end(self, trainer, state, frozen, batch, metrics, step: int):
        batch_idx = getattr(trainer, "batch_idx", step)
        if not self.check_step_idx(step, batch_idx):
            return
        self._last_logged = self.get_step_idx(step, batch_idx)
        try:
            self._log_images(trainer, state, frozen, batch, step)
        except Exception:
            logger.exception("image logging failed")

    # -- producers -----------------------------------------------------------

    def _log_images(self, trainer, state, frozen, batch, step: int):
        engine = trainer.engine
        n = self.max_images
        prepped = trainer.prepare_batch(batch)
        prepped = {
            k: v[:n] if hasattr(v, "__getitem__") and not isinstance(v, str) else v
            for k, v in prepped.items()
        }
        captions = batch.get(trainer.caption_key)

        if hasattr(engine, "g_step"):
            # VAE/GAN engine: recon observability (autoencoder.py:373-427)
            images = engine.log_images(state, prepped, num_img=n, rng=jax.random.PRNGKey(step))
        else:
            if engine.sampler is None:
                return
            # EMA scope for plotting (models/diffusion.py:413 ema_scope):
            # inputs / reconstructions / samples / rendered conditioning
            images = engine.log_images(
                engine.eval_params(state),
                frozen,
                prepped,
                num_img=n,
                rng=jax.random.PRNGKey(step),
                captions=list(captions[:n]) if captions is not None else None,
                num_steps=self.num_steps,
            )
        self._write(trainer, images, batch, captions, step)

    # -- sink (image_logger.py:169-320 log_local) ----------------------------

    def _rescale(self, arr: np.ndarray) -> np.ndarray:
        arr = np.asarray(arr, np.float32)
        if self.clamp:
            arr = np.clip(arr, -1.0, 1.0)
        if self.rescale:
            arr = (arr + 1.0) / 2.0
        return arr

    def _write(self, trainer, images: dict, batch, captions, step: int):
        from neurosis_tpu.utils.image import array_to_pil, save_image_grid

        epoch = getattr(trainer, "epoch", 0)
        batch_idx = getattr(trainer, "batch_idx", 0)
        out_dir = Path(trainer.root_dir) / "images" / self.split
        out_dir.mkdir(parents=True, exist_ok=True)
        fstem = f"gs{step:06d}_e{epoch:04d}_b{batch_idx:06d}"
        rank = jax.process_index()
        if rank:
            fstem += f"_r{rank}"  # avoid cross-rank collisions (log_local:187-189)

        wandb_dict: dict = {}
        table_dict: dict = {}
        for key, arr in images.items():
            arr = self._rescale(arr)
            pils = [array_to_pil(arr[i]) for i in range(arr.shape[0])]
            for idx, img in enumerate(pils):
                img.save(out_dir / f"{fstem}_{key.replace('/', '_')}_{idx:02d}.png")
            wandb_dict[f"{self.split}/{key}"] = pils
            table_dict[key] = pils
        if "samples" in images and captions is not None:
            nimg = images["samples"].shape[0]
            grid_path = out_dir / f"{fstem}_samples_grid.png"
            save_image_grid(
                [np.asarray(images["samples"][i]) for i in range(nimg)],
                grid_path,
                captions=list(captions[:nimg]),
                label=f"step {step}",
            )
            wandb_dict[f"{self.split}/sample_grid"] = [grid_path]
            table_dict["caption"] = list(captions[:nimg])
        for key in self.extra_log_keys:
            if key in batch:
                vals = batch[key]
                table_dict[key] = [
                    tuple(np.asarray(v).tolist()) if hasattr(v, "__len__") and not isinstance(v, str) else v
                    for v in (vals if isinstance(vals, (list, tuple)) else list(np.asarray(vals)))
                ]

        wb = getattr(trainer.logger, "wandb", None)
        if wb is not None:
            try:
                import wandb as _wandb

                payload = {
                    k: [_wandb.Image(str(x) if isinstance(x, Path) else x) for x in v]
                    for k, v in wandb_dict.items()
                }
                wb.log(payload, step=step)
                if self.wandb_log_table and table_dict:
                    cols = list(table_dict)
                    nrows = max(len(v) for v in table_dict.values())
                    rows = [
                        [
                            (_wandb.Image(table_dict[c][i]) if hasattr(table_dict[c][i], "save") else table_dict[c][i])
                            if i < len(table_dict[c])
                            else None
                            for c in cols
                        ]
                        for i in range(nrows)
                    ]
                    wb.log({f"{self.split}/table": _wandb.Table(columns=cols, data=rows)}, step=step)
            except Exception:
                logger.exception("wandb image logging failed")
        logger.info(f"logged {sorted(images)} images at step {step} → {out_dir}")


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
    parity, trainer/callbacks/wandb.py:15-34). With an active wandb run:
    hyperparams update + config uploaded as a `config`-type artifact +
    optional `log_code` of the package source."""

    def __init__(self, config: Optional[dict] = None, log_code: bool = False):
        self.config = config
        self.log_code = log_code

    def on_fit_start(self, trainer, state):
        if not self.config:
            return
        import yaml

        path = Path(trainer.root_dir) / "config.yaml"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(yaml.safe_dump(self.config, sort_keys=False))
        wb = getattr(trainer.logger, "wandb", None)
        if wb is not None:
            try:
                wb.config.update({"resolved_config": self.config}, allow_val_change=True)
                if hasattr(wb, "log_artifact"):
                    wb.log_artifact(str(path), type="config")
                if self.log_code and hasattr(wb, "log_code"):
                    import neurosis_tpu

                    wb.log_code(root=str(Path(neurosis_tpu.__file__).parent))
            except Exception:
                logger.exception("wandb config artifact upload failed")
        logger.info(f"saved resolved config → {path}")
