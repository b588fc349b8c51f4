"""End-to-end denoiser-path parity (SURVEY.md §7 step-2 exit criterion):

reference DiscreteDenoiser(torch UNet) vs ours (flax UNet, imported weights)
on FIXED z_t/σ/cond — then the weighted-MSE loss value. Randomness removed by
fixing inputs, so the comparison is exact math through the full stack.
"""

import numpy as np
import pytest

# reference-parity tests need the read-only reference checkout
import pathlib as _pl

pytestmark = pytest.mark.skipif(
    not _pl.Path("/root/reference/src/neurosis").exists(), reason="reference tree not mounted"
)

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from _reference_loader import load_reference_math, load_reference_unet  # noqa: E402

from neurosis_tpu.checkpoint import import_torch_params  # noqa: E402
from neurosis_tpu.diffusion import (  # noqa: E402
    DiscreteDenoiser,
    EpsPreconditioning,
    EpsWeighting,
    LegacyDDPMDiscretization,
)
from neurosis_tpu.losses.functions import batch_mse_loss  # noqa: E402
from neurosis_tpu.models.unet import UNetModel  # noqa: E402

CFG = dict(
    in_channels=4,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=[2],
    channel_mult=[1, 2],
    num_heads=2,
    transformer_depth=1,
    context_dim=24,
)


def test_denoised_output_and_loss_parity():
    import torch

    om = load_reference_unet()
    precond_mod, weighting_mod, discret_mod, _ = load_reference_math()

    # reference denoiser module
    import importlib.util
    import sys
    import types

    from _reference_loader import REF_SRC, _load

    sys.modules["neurosis.modules.diffusion.denoiser_preconditioning"] = precond_mod
    if "neurosis.modules.diffusion.denoiser" not in sys.modules:
        ref_den_mod = _load("neurosis.modules.diffusion.denoiser", "modules/diffusion/denoiser.py")
    else:
        ref_den_mod = sys.modules["neurosis.modules.diffusion.denoiser"]

    # newer torch rejects negative-stride numpy index arrays (same patch as
    # test_samplers)
    _orig = discret_mod.generate_roughly_equally_spaced_steps
    discret_mod.generate_roughly_equally_spaced_steps = lambda *a, **k: np.ascontiguousarray(_orig(*a, **k))

    torch.manual_seed(0)
    ref_unet = om.UNetModel(**CFG, spatial_transformer_attn_type="torch-sdp")
    ref_unet.eval()

    ref_denoiser = ref_den_mod.DiscreteDenoiser(
        preconditioning=precond_mod.EpsPreconditioning(),
        num_idx=50,
        discretization=discret_mod.LegacyDDPMDiscretization(),
    )

    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 4, 16, 16).astype(np.float32)  # clean latents
    noise = rng.randn(2, 4, 16, 16).astype(np.float32)
    sigma = np.asarray([0.4, 2.5], np.float32)
    ctx = rng.randn(2, 7, 24).astype(np.float32)
    z_t = x0 + sigma[:, None, None, None] * noise

    class _Wrap(torch.nn.Module):
        def __init__(self, net):
            super().__init__()
            self.net = net

        def forward(self, x, t, cond, **kw):
            return self.net(x, t, context=cond["crossattn"])

    with torch.no_grad():
        ref_out = ref_denoiser(
            _Wrap(ref_unet),
            torch.from_numpy(z_t),
            torch.from_numpy(sigma),
            {"crossattn": torch.from_numpy(ctx)},
        ).numpy()

    w = weighting_mod.EpsWeighting()(torch.from_numpy(sigma))
    ref_loss = (
        ((torch.from_numpy(ref_out) - torch.from_numpy(x0)) ** 2).mean(dim=(1, 2, 3))
        * w
    ).numpy()

    # ours
    model = UNetModel(**CFG)
    zj = jnp.asarray(z_t.transpose(0, 2, 3, 1))
    tmpl = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), zj, jnp.asarray(sigma), jnp.asarray(ctx))
    )
    params, missing, unexpected = import_torch_params(
        tmpl["params"], {k: v.numpy() for k, v in ref_unet.state_dict().items()}
    )
    assert not missing and not unexpected

    denoiser = DiscreteDenoiser(
        preconditioning=EpsPreconditioning(), num_idx=50, discretization=LegacyDDPMDiscretization()
    )

    def network_apply(x, c_noise, cond, **kw):
        return model.apply({"params": params}, x, c_noise, cond["crossattn"])

    out = jax.jit(
        lambda z, s, c: denoiser(network_apply, z, s, {"crossattn": c}, "D")
    )(zj, jnp.asarray(sigma), jnp.asarray(ctx))

    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=5e-4, rtol=5e-3
    )

    our_loss = batch_mse_loss(out, jnp.asarray(x0.transpose(0, 2, 3, 1))) * EpsWeighting()(
        jnp.asarray(sigma)
    )
    np.testing.assert_allclose(np.asarray(our_loss), ref_loss, rtol=1e-3)
