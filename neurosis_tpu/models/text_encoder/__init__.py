"""Frozen text encoders: CLIP-L (HF layout) and OpenCLIP bigG (open_clip layout)."""

from .clip import CLIPTextTower, OpenCLIPTextTower, split_openclip_qkv

__all__ = ["CLIPTextTower", "OpenCLIPTextTower", "split_openclip_qkv"]
