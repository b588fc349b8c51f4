"""Golden parity vs the reference torch GAN stack: PatchGAN discriminator
forward on shared weights (incl. ActNorm variant), hinge/vanilla disc losses,
and the step-threshold weighting helper."""

import pathlib as _pl

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not _pl.Path("/root/reference/src/neurosis").exists(), reason="reference tree not mounted"
)

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _load_ref_patchgan():
    import sys
    import types

    sys.path.insert(0, "tests")
    from _reference_loader import _load

    # patchgan/model.py imports ActNorm from neurosis.modules.layers
    if "neurosis.modules.layers" not in sys.modules:
        layers = _load("neurosis.modules.layers", "modules/layers.py")
        sys.modules["neurosis.modules.layers"] = layers
    if "neurosis.modules.losses.types" not in sys.modules:
        sys.modules["neurosis.modules.losses.types"] = _load(
            "neurosis.modules.losses.types", "modules/losses/types.py"
        )
    model = _load("ref_patchgan_model", "modules/losses/patchgan/model.py")
    functions = _load("ref_loss_functions", "modules/losses/functions.py")
    return model, functions


@pytest.mark.parametrize("use_actnorm", [False, True])
def test_discriminator_forward_parity(use_actnorm):
    """Same weights, same input → same logits (train mode: both sides
    normalize with current-batch statistics)."""
    import torch

    ref_model, _ = _load_ref_patchgan()

    from neurosis_tpu.checkpoint.torch_import import import_torch_params
    from neurosis_tpu.losses.patchgan import NLayerDiscriminator

    torch.manual_seed(0)
    ref = ref_model.NLayerDiscriminator(input_nc=3, ndf=16, n_layers=2, use_actnorm=use_actnorm)
    ref.apply(ref_model.weights_init)
    ref.train()

    x_np = np.random.RandomState(0).randn(4, 24, 24, 3).astype(np.float32)
    x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))

    if use_actnorm:
        # reference ActNorm initializes from the first forward batch
        with torch.no_grad():
            _ = ref(x_t)

    ours = NLayerDiscriminator(input_nc=3, ndf=16, n_layers=2, use_actnorm=use_actnorm)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x_np))

    state = {k: v for k, v in ref.state_dict().items() if "running" not in k and "num_batches" not in k}
    if use_actnorm:
        # reference ActNorm params are (1, C, 1, 1) named loc/scale; ours are
        # (C,) and the importer's leaf map sends flax 'scale' → torch 'weight'
        renamed = {}
        for k, v in state.items():
            if k.endswith(".scale") or k.endswith(".loc"):
                v = v.reshape(-1)
                if k.endswith(".scale"):
                    k = k[: -len(".scale")] + ".weight"
            renamed[k] = v
        state = renamed
    params, missing, unexpected = import_torch_params(variables["params"], state)
    assert not missing, missing
    assert not [u for u in unexpected if "initialized" not in u], unexpected

    with torch.no_grad():
        ref_out = ref(x_t).numpy().transpose(0, 2, 3, 1)

    apply_vars = {"params": params}
    if "batch_stats" in variables:
        apply_vars["batch_stats"] = variables["batch_stats"]
        out, _ = ours.apply(apply_vars, jnp.asarray(x_np), train=True, mutable=["batch_stats"])
    else:
        out = ours.apply(apply_vars, jnp.asarray(x_np), train=True)

    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=2e-4)


def test_disc_loss_value_parity():
    import torch

    _, ref_fn = _load_ref_patchgan()
    from neurosis_tpu.losses.functions import hinge_d_loss, vanilla_d_loss

    rng = np.random.RandomState(1)
    real = rng.randn(2, 5, 5, 1).astype(np.float32)
    fake = rng.randn(2, 5, 5, 1).astype(np.float32)

    ref_h = ref_fn.HingeDiscLoss(weight=0.7)(torch.from_numpy(real), torch.from_numpy(fake))
    ours_h = 0.7 * hinge_d_loss(jnp.asarray(real), jnp.asarray(fake))
    np.testing.assert_allclose(float(ours_h), float(ref_h), rtol=1e-6)

    ref_v = ref_fn.VanillaDiscLoss(weight=1.3)(torch.from_numpy(real), torch.from_numpy(fake))
    ours_v = 1.3 * vanilla_d_loss(jnp.asarray(real), jnp.asarray(fake))
    np.testing.assert_allclose(float(ours_v), float(ref_v), rtol=1e-6)

    # start_step gating returns exactly 0 before the threshold
    ref_gated = ref_fn.HingeDiscLoss(start_step=10)(
        torch.from_numpy(real), torch.from_numpy(fake), global_step=5
    )
    assert float(ref_gated) == 0.0  # documents the contract our disc_start mirrors
