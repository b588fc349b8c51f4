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


def test_general_lpips_disc_loss_component_parity():
    """GeneralLPIPSWithDiscriminator vs reference (eval mode, shared D
    weights, perceptual_weight=0): rec/g/disc loss components, logits and
    logvar match. The reference's idx-0 *total* adds the unreduced
    p_rec_loss tensor on top of the already-summed NLL
    (discriminator_loss.py:281 `loss = p_rec_loss + g_weighted +
    nll_weighted`) — a broadcasty upstream quirk we deliberately do not
    reproduce (ours is the sgm-canonical nll + d_weight*disc_factor*g), so
    parity is asserted on the components."""
    import sys
    import types

    import torch

    _load_ref_patchgan()  # installs layers/types modules
    from _reference_loader import _load

    # stub the viz-only imports (torchvision.utils.make_grid, used only in
    # the logit-visualization path we don't call)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: a[0]
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
        _tv_added = True
    else:
        _tv_added = False

    # LPIPS import chain (perceptual_weight=0 so it is never exercised, but
    # the constructor builds it): stub neurosis.modules.losses.perceptual
    percep_stub = types.ModuleType("neurosis.modules.losses.perceptual")

    class _NullLPIPS(torch.nn.Module):
        def eval(self):
            return self

        def forward(self, a, b):
            return torch.zeros(a.shape[0])

    percep_stub.LPIPS = _NullLPIPS
    prev_percep = sys.modules.get("neurosis.modules.losses.perceptual")
    sys.modules["neurosis.modules.losses.perceptual"] = percep_stub
    # functions + patchgan package paths for the module's imports
    if "neurosis.modules.losses.functions" not in sys.modules:
        sys.modules["neurosis.modules.losses.functions"] = _load(
            "neurosis.modules.losses.functions", "modules/losses/functions.py"
        )
    pg_pkg = types.ModuleType("neurosis.modules.losses.patchgan")
    ref_pg = sys.modules["ref_patchgan_model"]
    pg_pkg.NLayerDiscriminator = ref_pg.NLayerDiscriminator
    pg_pkg.weights_init = ref_pg.weights_init
    sys.modules.setdefault("neurosis.modules.losses.patchgan", pg_pkg)

    try:
        ref_mod = _load(
            "ref_general_disc_loss", "modules/autoencoding/losses/discriminator_loss.py"
        )

        torch.manual_seed(3)
        ref = ref_mod.GeneralLPIPSWithDiscriminator(
            disc_start=2, perceptual_weight=0.0, disc_num_layers=2, rec_loss_type="l2",
            logvar_init=0.3, disc_factor=0.9,
        )
        ref.eval()

        from neurosis_tpu.checkpoint.torch_import import import_torch_params
        from neurosis_tpu.losses.discriminator_loss import GeneralLPIPSWithDiscriminator

        ours = GeneralLPIPSWithDiscriminator(
            disc_start=2, perceptual_weight=0.0, disc_num_layers=2, rec_loss_type="l2",
            logvar_init=0.3, disc_factor=0.9,
        )
        rng = np.random.RandomState(7)
        x = rng.randn(2, 24, 24, 3).astype(np.float32) * 0.5
        rec = x + rng.randn(2, 24, 24, 3).astype(np.float32) * 0.1

        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(rec), jnp.asarray(0))
        state = {
            k: v for k, v in ref.state_dict().items()
            if "running" not in k and "num_batches" not in k and not k.startswith("perceptual")
        }
        params, missing, unexpected = import_torch_params(variables["params"], state)
        assert not missing, missing

        x_t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        rec_t = torch.from_numpy(rec.transpose(0, 3, 1, 2))

        for step in (0, 5):  # before/after disc_start (eval: gate is open)
            with torch.no_grad():
                # weights=1.0: the reference's `if weights > 0` crashes on the
                # None default (another upstream latent bug)
                _, ref_log0 = ref(
                    x_t, rec_t, global_step=step, optimizer_idx=0, weights=torch.tensor(1.0)
                )
                ref_d, ref_log1 = ref(x_t, rec_t, global_step=step, optimizer_idx=1)

            av = {"params": params, "batch_stats": variables.get("batch_stats", {})}
            (loss0, log0) = ours.apply(
                av, jnp.asarray(x), jnp.asarray(rec), jnp.asarray(step), optimizer_idx=0, train=False
            )
            (d_loss, log1) = ours.apply(
                av, jnp.asarray(x), jnp.asarray(rec), jnp.asarray(step), optimizer_idx=1, train=False
            )

            np.testing.assert_allclose(
                float(log0["train/loss/rec"]), float(ref_log0["train/loss/l2"]), rtol=1e-4
            )
            np.testing.assert_allclose(
                float(log0["train/loss/g"]), float(ref_log0["train/loss/g"]), rtol=1e-3, atol=1e-5
            )
            np.testing.assert_allclose(
                float(log0["train/scalars/logvar"]), float(ref_log0["train/scalars/logvar"]), rtol=1e-6
            )
            np.testing.assert_allclose(float(d_loss), float(ref_d), rtol=1e-3, atol=1e-6)
            np.testing.assert_allclose(
                float(log1["train/logits/real"]), float(ref_log1["train/logits/real"]), rtol=1e-3, atol=1e-5
            )
            np.testing.assert_allclose(
                float(log1["train/logits/fake"]), float(ref_log1["train/logits/fake"]), rtol=1e-3, atol=1e-5
            )
    finally:
        if prev_percep is None:
            sys.modules.pop("neurosis.modules.losses.perceptual", None)
        else:
            sys.modules["neurosis.modules.losses.perceptual"] = prev_percep
        if _tv_added:
            sys.modules.pop("torchvision", None)
            sys.modules.pop("torchvision.utils", None)


def test_taming_autoencoder_loss_parity():
    """AutoencoderLPIPSWithDiscr vs reference (eval mode, shared D weights,
    perceptual_weight=0, r1=0): generator total + components and the
    discriminator loss match.

    Tested at disc_start=-1: with disc_start>0 the REFERENCE d_loss is
    always zero — vae_lpips_discr.py:184 builds HingeDiscLoss with
    start_step=disc_start but forward (line 373) never passes global_step,
    so the inner gate compares the default -1 < start_step forever (third
    upstream latent bug found by these parity tests; our engine gates once
    on disc_start and trains the discriminator as intended)."""
    import sys
    import types

    import torch

    _load_ref_patchgan()
    from _reference_loader import _load

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: a[0]
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
        tv_added = True
    else:
        tv_added = False

    percep_stub = types.ModuleType("neurosis.modules.losses.perceptual")

    class _NullLPIPS(torch.nn.Module):
        def eval(self):
            return self

        def forward(self, a, b):
            return torch.zeros(a.shape[0])

    percep_stub.LPIPS = _NullLPIPS
    prev_percep = sys.modules.get("neurosis.modules.losses.perceptual")
    sys.modules["neurosis.modules.losses.perceptual"] = percep_stub
    if "neurosis.modules.losses.functions" not in sys.modules:
        sys.modules["neurosis.modules.losses.functions"] = _load(
            "neurosis.modules.losses.functions", "modules/losses/functions.py"
        )
    pg_pkg = types.ModuleType("neurosis.modules.losses.patchgan")
    ref_pg = sys.modules["ref_patchgan_model"]
    pg_pkg.NLayerDiscriminator = ref_pg.NLayerDiscriminator
    pg_pkg.weights_init = ref_pg.weights_init
    sys.modules.setdefault("neurosis.modules.losses.patchgan", pg_pkg)
    # EMATracker import
    if "neurosis.trainer.util" not in sys.modules:
        tu = types.ModuleType("neurosis.trainer.util")

        class _EMA:
            def __init__(self, *a, **k):
                self.value = 0.0

            def update(self, v):
                self.value = float(v)
                return self.value

        tu.EMATracker = _EMA
        sys.modules["neurosis.trainer.util"] = tu

    try:
        ref_mod = _load("ref_taming_loss", "modules/autoencoding/losses/vae_lpips_discr.py")

        torch.manual_seed(5)
        ref = ref_mod.AutoencoderLPIPSWithDiscr(
            recon_type="l1", perceptual_weight=0.0, disc_start=-1, disc_factor=0.8,
            disc_kwargs={"n_layers": 2, "ndf": 16},
        )
        ref.eval()

        from neurosis_tpu.checkpoint.torch_import import import_torch_params
        from neurosis_tpu.losses.vae_loss import AutoencoderLPIPSWithDiscr

        ours = AutoencoderLPIPSWithDiscr(
            recon_type="l1", perceptual_weight=0.0, disc_start=-1, disc_factor=0.8,
            disc_n_layers=2, disc_ndf=16,
        )
        rng = np.random.RandomState(11)
        x = rng.randn(2, 24, 24, 3).astype(np.float32) * 0.4
        rec = x + rng.randn(2, 24, 24, 3).astype(np.float32) * 0.1

        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(rec), jnp.asarray(0))
        state = {
            k: v for k, v in ref.state_dict().items()
            if "running" not in k and "num_batches" not in k and not k.startswith("perceptual")
        }
        params, missing, _ = import_torch_params(variables["params"], state)
        assert not missing, missing

        x_t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        rec_t = torch.from_numpy(rec.transpose(0, 3, 1, 2))
        for step in (0, 5):
            # idx-0 must run with grad enabled: calc_r1_penalty always calls
            # torch.autograd.grad even at disc_lambda_r1=0
            ref_loss0, ref_log0 = ref(x_t.clone(), rec_t, global_step=step, optimizer_idx=0)
            ref_loss0 = ref_loss0.detach()
            with torch.no_grad():
                ref_d, ref_log1 = ref(x_t, rec_t, global_step=step, optimizer_idx=1)

            av = {"params": params, "batch_stats": variables.get("batch_stats", {})}
            loss0, log0 = ours.apply(
                av, jnp.asarray(x), jnp.asarray(rec), jnp.asarray(step), optimizer_idx=0, train=False
            )
            d_loss, log1 = ours.apply(
                av, jnp.asarray(x), jnp.asarray(rec), jnp.asarray(step), optimizer_idx=1, train=False
            )

            np.testing.assert_allclose(
                float(jnp.mean(loss0)), float(ref_loss0.mean()), rtol=1e-3, atol=1e-5
            )
            np.testing.assert_allclose(
                float(log0["train/loss/rec"]), float(ref_log0["train/loss/rec"]), rtol=1e-4
            )
            np.testing.assert_allclose(
                float(log0["train/loss/g"]), float(ref_log0["train/loss/g"]), rtol=1e-3, atol=1e-5
            )
            np.testing.assert_allclose(float(jnp.mean(d_loss)), float(ref_d), rtol=1e-3, atol=1e-6)
    finally:
        if prev_percep is None:
            sys.modules.pop("neurosis.modules.losses.perceptual", None)
        else:
            sys.modules["neurosis.modules.losses.perceptual"] = prev_percep
        if tv_added:
            sys.modules.pop("torchvision", None)
            sys.modules.pop("torchvision.utils", None)
