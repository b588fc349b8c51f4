"""Tag-frequency loss scaling.

The reference ships only the CONFIG INTERFACE for this feature
(configs/hook/loss_scale.example.yml; README.md:39 notes the implementation is
"not entirely pushed to public"), so the semantics here are inferred from that
contract and documented (SURVEY.md §7 hard-part 6):

  - `TagFreqScale(scales=[[threshold, scale], ...])`: maps a tag's cumulative
    observed count to a loss multiplier — the scale of the largest threshold
    <= count ([-1, 1.1] boosts unseen tags, [40000, 0.80] damps saturated ones).
  - `TagRewards(**{tag: multiplier})`: static per-tag multipliers.
  - `TagFrequencyHook(input_key, tag_sep, check_fn, alpha, beta, strength,
    freq_scale, tag_rewards)`:
      * maintains cumulative per-tag counts over filtered tags (check_fn);
      * per-sample multiplier = mean over its tags of freq_scale(count) ×
        reward(tag);
      * `beta` EMA-smooths the batch-mean multiplier across steps; `alpha`
        blends each sample's multiplier with that running mean
        (final = alpha·sample + (1−alpha)·ema);
      * `strength` lerps the final multiplier toward 1.

  The hook runs host-side: `pre_hook` injects a per-sample `loss_scale` array
  the jitted loss multiplies in (StandardDiffusionLoss consumes
  batch['loss_scale']); `batch_hook` reports tag stats in the log dict.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional, Sequence, Union

import numpy as np

from .common import LossHook

logger = logging.getLogger(__name__)


def is_artist_or_character(tag: str) -> bool:
    """Default filter: namespace-prefixed artist/character tags."""
    tag = tag.strip().lower()
    return tag.startswith(("artist:", "character:", "art:", "char:"))


class TagFreqScale:
    """count → multiplier step table."""

    def __init__(self, scales: Sequence[Sequence[float]]):
        table = sorted((int(t), float(s)) for t, s in scales)
        self.thresholds = np.asarray([t for t, _ in table])
        self.values = np.asarray([s for _, s in table])

    def __call__(self, count: int) -> float:
        idx = int(np.searchsorted(self.thresholds, count, side="right")) - 1
        idx = max(idx, 0)
        return float(self.values[idx])


class TagRewards:
    """Static per-tag multipliers (keys normalized: '_'→' ' tolerated)."""

    def __init__(self, **rewards: float):
        self.rewards = {}
        for k, v in rewards.items():
            if isinstance(v, str):
                v = float(v.rstrip(", "))
            self.rewards[k.replace("_", " ").strip()] = float(v)
            self.rewards[k.strip()] = float(v)

    def __call__(self, tag: str) -> float:
        return self.rewards.get(tag, self.rewards.get(tag.replace("_", " "), 1.0))


class TagFrequencyHook(LossHook):
    def __init__(
        self,
        input_key: str = "caption",
        tag_sep: str = ", ",
        check_fn: Optional[Union[str, Callable[[str], bool]]] = None,
        alpha: float = 0.2,
        beta: float = 0.99,
        strength: float = 1.0,
        freq_scale: Optional[TagFreqScale] = None,
        tag_rewards: Optional[TagRewards] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.input_key = input_key
        self.tag_sep = tag_sep
        if isinstance(check_fn, str):
            if check_fn.rsplit(".", 1)[-1] == "is_artist_or_character":
                check_fn = is_artist_or_character
            else:
                import importlib

                mod, _, fn = check_fn.rpartition(".")
                check_fn = getattr(importlib.import_module(mod), fn)
        self.check_fn = check_fn
        self.alpha = alpha
        self.beta = beta
        self.strength = strength
        self.freq_scale = freq_scale or TagFreqScale([[-1, 1.0]])
        self.tag_rewards = tag_rewards or TagRewards()
        self.counts: dict[str, int] = {}
        self._ema = 1.0

    def _sample_tags(self, caption: str) -> list[str]:
        tags = [t.strip() for t in str(caption).split(self.tag_sep) if t.strip()]
        if self.check_fn is not None:
            counted = [t for t in tags if self.check_fn(t)]
        else:
            counted = tags
        return tags, counted

    def _sample_scale(self, caption: str) -> float:
        tags, counted = self._sample_tags(caption)
        factors = []
        for t in counted:
            factors.append(self.freq_scale(self.counts.get(t, 0)))
        for t in tags:
            r = self.tag_rewards(t)
            if r != 1.0:
                factors.append(r)
        if not factors:
            return 1.0
        return float(np.mean(factors))

    def pre_hook(self, trainer, engine, batch: dict, batch_idx: int) -> dict:
        captions = batch.get(self.input_key)
        if captions is None:
            return batch
        if isinstance(captions, (str, bytes)):
            captions = [captions]
        raw = [c.decode() if isinstance(c, (bytes, np.bytes_)) else str(c) for c in captions]

        scales = np.asarray([self._sample_scale(c) for c in raw], np.float32)
        batch_mean = float(scales.mean())
        self._ema = self.beta * self._ema + (1.0 - self.beta) * batch_mean
        blended = self.alpha * scales + (1.0 - self.alpha) * self._ema
        final = 1.0 + self.strength * (blended - 1.0)
        batch = dict(batch)
        batch["loss_scale"] = final.astype(np.float32)

        # update counts AFTER computing scales (a tag's first batch gets the
        # unseen boost)
        for c in raw:
            _, counted = self._sample_tags(c)
            for t in counted:
                self.counts[t] = self.counts.get(t, 0) + 1
        return batch

    def batch_hook(self, engine, batch: dict, loss, loss_dict: dict) -> tuple:
        loss_dict = dict(loss_dict)
        if "loss_scale" in batch:
            loss_dict["train/tag_loss_scale_mean"] = float(np.mean(batch["loss_scale"]))
        loss_dict["train/tag_vocab_size"] = float(len(self.counts))
        return loss, loss_dict
