"""Inference-time sampling: k-diffusion samplers + CFG guiders."""

from .guidance import Guider, IdentityGuider, LinearPredictionGuider, VanillaCFG
from .samplers import (
    DPMPP2MSampler,
    DPMPP2SAncestralSampler,
    EulerAncestralSampler,
    EulerEDMSampler,
    HeunEDMSampler,
    LinearMultistepSampler,
)

__all__ = [
    "Guider",
    "IdentityGuider",
    "LinearPredictionGuider",
    "VanillaCFG",
    "DPMPP2MSampler",
    "DPMPP2SAncestralSampler",
    "EulerAncestralSampler",
    "EulerEDMSampler",
    "HeunEDMSampler",
    "LinearMultistepSampler",
]
