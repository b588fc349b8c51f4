"""LPIPS perceptual metric in Flax (parity: modules/losses/perceptual.py:64-228).

AlexNet/VGG16 feature trunks (torchvision `features` layouts), per-channel unit
normalization, learned 1x1 lin heads, spatial average sum. Weights load from
torch-format state dicts (torchvision trunk + lpips v0.1 lin heads) found via
`NEUROSIS_DATA_DIR`, the HF cache, or an explicit path — the same
runtime-download posture as the reference (which fetches torchvision weights
and ships only the lin heads, data/accessors.py:22).

NHWC throughout; inputs in [-1, 1].
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

logger = logging.getLogger(__name__)

# torchvision trunk layouts: (features-index of the conv, out_channels, kernel,
# stride, padding, maxpool_before)
_ALEX_TAPS = ["features.1", "features.4", "features.7", "features.9", "features.11"]
_VGG_TAPS = ["features.3", "features.8", "features.15", "features.22", "features.29"]

ALEX_CHANNELS = (64, 192, 384, 256, 256)
VGG_CHANNELS = (64, 128, 256, 512, 512)

# ImageNet scaling (perceptual.py:189-199)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, features, kernel, stride, pad, name):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        param_dtype=jnp.float32,
        name=name,
    )(x)


def _maxpool(x, k=3, s=2):
    return nn.max_pool(x, (k, k), strides=(s, s))


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features with relu taps 1/4/7/9/11."""

    @nn.compact
    def __call__(self, x: jax.Array) -> dict:
        taps = {}
        x = nn.relu(_conv(x, 64, 11, 4, 2, "features.0"))
        taps["relu1"] = x
        x = _maxpool(x)
        x = nn.relu(_conv(x, 192, 5, 1, 2, "features.3"))
        taps["relu2"] = x
        x = _maxpool(x)
        x = nn.relu(_conv(x, 384, 3, 1, 1, "features.6"))
        taps["relu3"] = x
        x = nn.relu(_conv(x, 256, 3, 1, 1, "features.8"))
        taps["relu4"] = x
        x = nn.relu(_conv(x, 256, 3, 1, 1, "features.10"))
        taps["relu5"] = x
        return taps


class VGG16Features(nn.Module):
    """torchvision VGG16.features with relu taps 3/8/15/22/29."""

    @nn.compact
    def __call__(self, x: jax.Array) -> dict:
        taps = {}
        cfg = [
            # (convs, channels, tap_name, feature_indices)
            (2, 64, "relu1", (0, 2)),
            (2, 128, "relu2", (5, 7)),
            (3, 256, "relu3", (10, 12, 14)),
            (3, 512, "relu4", (17, 19, 21)),
            (3, 512, "relu5", (24, 26, 28)),
        ]
        for block, (n_convs, ch, tap, idxs) in enumerate(cfg):
            for conv_i, feat_idx in zip(range(n_convs), idxs):
                x = nn.relu(_conv(x, ch, 3, 1, 1, f"features.{feat_idx}"))
            taps[tap] = x
            if block < 4:
                x = _maxpool(x, 2, 2)
        return taps


class LPIPS(nn.Module):
    """Perceptual distance; __call__(x, y) -> (B, 1, 1, 1) (perceptual.py:160-186)."""

    pnet_type: str = "alex"
    use_lpips_heads: bool = True  # `lpips` flag in the reference
    spatial: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array, normalize: bool = False) -> jax.Array:
        if x.shape[1] < 32 or x.shape[2] < 32:
            raise ValueError(
                f"LPIPS needs inputs >= 32px (got {x.shape[1]}x{x.shape[2]}); "
                "the AlexNet/VGG trunk pools smaller maps to zero size"
            )
        if normalize:
            x = x * 2.0 - 1.0
            y = y * 2.0 - 1.0

        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        x = (x - shift) / scale
        y = (y - shift) / scale

        net_cls = AlexNetFeatures if "alex" in self.pnet_type else VGG16Features
        taps = _ALEX_TAPS if "alex" in self.pnet_type else _VGG_TAPS
        keys = ["relu1", "relu2", "relu3", "relu4", "relu5"]
        net = net_cls(name="pnet")
        fx, fy = net(x), net(y)

        val = 0.0
        for i, key in enumerate(keys):
            nx = _unit_normalize(fx[key])
            ny = _unit_normalize(fy[key])
            diff = (nx - ny) ** 2
            if self.use_lpips_heads:
                # 1x1 conv, no bias (NetLinLayer, perceptual.py:202-215);
                # named lin<i>.model.1 — the shipped safetensors key layout
                diff = nn.Conv(
                    1,
                    (1, 1),
                    use_bias=False,
                    param_dtype=jnp.float32,
                    name=f"lin{i}.model.1",
                )(diff)
            else:
                diff = jnp.sum(diff, axis=-1, keepdims=True)
            val = val + jnp.mean(diff, axis=(1, 2), keepdims=True)
        return val


def _unit_normalize(feat: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(feat**2, axis=-1, keepdims=True))
    return feat / (norm + eps)


# ---------------------------------------------------------------------------
# weight loading
# ---------------------------------------------------------------------------


def find_lpips_weights(pnet_type: str = "alex") -> Optional[Path]:
    """Locate `{alex,vgg}_lpips_v0.1.safetensors` (lin heads).

    Precedence: NEUROSIS_DATA_DIR > packaged asset (neurosis_tpu/assets/lpips,
    shipped in the wheel like the reference's src/neurosis/data/lpips).
    """
    candidates = []
    env = os.environ.get("NEUROSIS_DATA_DIR")
    if env:
        candidates.append(Path(env) / "lpips" / f"{pnet_type}_lpips_v0.1.safetensors")
        candidates.append(Path(env) / f"{pnet_type}_lpips_v0.1.safetensors")
    for c in candidates:
        if c.exists():
            return c
    from neurosis_tpu.assets import asset_path

    return asset_path("lpips", f"{pnet_type}_lpips_v0.1.safetensors")


def load_lpips_params(params_template, pnet_type: str = "alex", trunk_state: Optional[dict] = None,
                      lin_path: Optional[Path] = None):
    """Fill LPIPS params from torch state dicts. Missing weights keep their
    (random) init — usable for shape tests, logged as a warning."""
    from neurosis_tpu.checkpoint import import_torch_params

    state: dict = {}
    if trunk_state:
        # torchvision keys 'features.N.weight' → our 'pnet.features.N.weight'
        state.update({f"pnet.{k}": v for k, v in trunk_state.items()})
    lin_path = lin_path or find_lpips_weights(pnet_type)
    if lin_path is not None:
        from safetensors.numpy import load_file

        state.update(load_file(str(lin_path)))
    params, missing, unexpected = import_torch_params(params_template, state)
    if missing:
        logger.warning(f"LPIPS: {len(missing)} params not found in provided weights (random init)")
    return params
