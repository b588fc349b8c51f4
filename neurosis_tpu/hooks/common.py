"""LossHook ABC (parity: modules/hooks/common.py:11-51).

JAX adaptation: hooks run HOST-SIDE around the jitted step. `pre_hook` may
inject numeric keys into the batch (e.g. 'loss_scale' per-sample multipliers)
that the in-jit loss consumes; `batch_hook` rewrites the (host) loss value /
log dict after the step.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional


class LossHook(ABC):
    def __init__(self, name: Optional[str] = None, **kwargs):
        self.name = name or self.__class__.__name__

    def pre_hook(self, trainer, engine, batch: dict, batch_idx: int) -> dict:
        """Before encode/step: may mutate/augment the batch (host-side)."""
        return batch

    @abstractmethod
    def batch_hook(self, engine, batch: dict, loss, loss_dict: dict) -> tuple:
        """After loss computation: (loss, loss_dict) rewrite."""
        raise NotImplementedError

    def __call__(self, engine, batch, loss, loss_dict=None, **kwargs):
        return self.batch_hook(engine, batch, loss, loss_dict or {}, **kwargs)
