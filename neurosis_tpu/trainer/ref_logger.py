"""ReferenceModelImageLogger — live regression harness.

Parity: trainer/callbacks/refimg_logger.py:25-214 — tracks recon MSE of the
training model against (a) a frozen reference VAE's reconstructions and (b) a
static saved batch (`ReferenceData` safetensors payload), logging mse and
improvement percentage. This is the reference's de-facto regression test
(SURVEY.md §4) and the anchor for our loss-curve-parity tier.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class ReferenceData:
    """Static payload: input images + reference reconstructions (safetensors)."""

    def __init__(self, path):
        from safetensors.numpy import load_file

        data = load_file(str(path))
        self.inputs = data["inputs"]
        self.recons = data.get("recons")

    @staticmethod
    def save(path, inputs: np.ndarray, recons: Optional[np.ndarray] = None):
        from safetensors.numpy import save_file

        payload = {"inputs": np.asarray(inputs)}
        if recons is not None:
            payload["recons"] = np.asarray(recons)
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        save_file(payload, str(path))


class ReferenceModelImageLogger:
    """Logs static/mse and static/mse_pct improvement for a VAE engine."""

    def __init__(
        self,
        reference_data: Optional[str] = None,
        every_n_train_steps: int = 100,
        split: str = "train",
    ):
        self.data = ReferenceData(reference_data) if reference_data else None
        self.every_n = every_n_train_steps
        self.split = split
        self._initial_mse: Optional[float] = None
        self._recon_fn = None

    def on_train_batch_end(self, trainer, state, frozen, batch, metrics, step: int):
        if self.data is None or step % self.every_n != 0:
            return
        engine = trainer.engine
        if not hasattr(engine, "forward"):
            return
        try:
            if self._recon_fn is None:
                def recon(params, x):
                    _, recons, _ = engine.forward(params, x, None)
                    return recons

                self._recon_fn = jax.jit(recon)
            x = jnp.asarray(self.data.inputs)
            recons = self._recon_fn(state.params, x)
            target = jnp.asarray(self.data.recons) if self.data.recons is not None else x
            mse = float(jnp.mean((recons - target) ** 2))
            if self._initial_mse is None:
                self._initial_mse = mse
            pct = 100.0 * (1.0 - mse / max(self._initial_mse, 1e-12))
            trainer.logger.log({f"{self.split}/static/mse": mse, f"{self.split}/static/mse_pct": pct}, step)
        except Exception:
            logger.exception("reference image logging failed")


def distributed_stop_flag(should_stop: bool) -> bool:
    """Abort-consensus (ConflictAbortCallback parity, callbacks/system.py:119-120):
    all processes stop together — psum of a local stop flag across hosts."""
    import jax

    if jax.process_count() == 1:
        return should_stop
    flag = jnp.asarray(1.0 if should_stop else 0.0)
    total = jax.experimental.multihost_utils.process_allgather(flag).sum()
    return bool(total > 0)
