"""Loss hooks (parity: modules/hooks/common.py + configs/hook/loss_scale.example.yml)."""

from .common import LossHook
from .tag_loss import TagFreqScale, TagFrequencyHook, TagRewards, is_artist_or_character

__all__ = ["LossHook", "TagFreqScale", "TagFrequencyHook", "TagRewards", "is_artist_or_character"]
