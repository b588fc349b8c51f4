"""Golden parity tests: our jnp diffusion math vs the torch reference formulas,
loaded directly from /root/reference (SURVEY.md §4 mandate)."""

import numpy as np
import pytest

# reference-parity tests need the read-only reference checkout
import pathlib as _pl

pytestmark = pytest.mark.skipif(
    not _pl.Path("/root/reference/src/neurosis").exists(), reason="reference tree not mounted"
)

from tests._reference_loader import load_reference_math

import neurosis_tpu.diffusion as ntd

ref_precond, ref_weighting, ref_discret, ref_sigma = load_reference_math()

SIGMAS = np.array([0.01, 0.1, 0.5, 1.0, 2.5, 14.6, 80.0, 500.0], dtype=np.float32)
RF_SIGMAS = np.array([0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99], dtype=np.float32)  # t in (0,1)


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x))


PRECOND_PAIRS = [
    (ntd.EpsPreconditioning(), ref_precond.EpsPreconditioning(), SIGMAS),
    (ntd.VPreconditioning(), ref_precond.VPreconditioning(), SIGMAS),
    (ntd.VPreconditioningWithEDMcNoise(), ref_precond.VPreconditioningWithEDMcNoise(), SIGMAS),
    (ntd.EDMPreconditioning(sigma_data=0.5), ref_precond.EDMPreconditioning(sigma_data=0.5), SIGMAS),
    (ntd.RectifiedFlowXLPreconditioning(), ref_precond.RectifiedFlowXLPreconditioning(), RF_SIGMAS),
    (ntd.RectifiedFlowComfyPreconditioning(), ref_precond.RectifiedFlowComfyPreconditioning(), RF_SIGMAS),
]


@pytest.mark.parametrize("ours,theirs,sig", PRECOND_PAIRS, ids=lambda p: type(p).__name__)
def test_preconditioning_parity(ours, theirs, sig):
    if not isinstance(ours, ntd.DenoiserPreconditioning):
        pytest.skip("param is not a preconditioning")
    ours_out = ours(np.asarray(sig))
    theirs_out = theirs(_t(sig))
    for o, t, name in zip(ours_out, theirs_out, ["c_skip", "c_out", "c_in", "c_noise"]):
        np.testing.assert_allclose(np.asarray(o), t.numpy(), rtol=1e-4, atol=1e-5, err_msg=name)


WEIGHT_PAIRS = [
    (ntd.UnitWeighting(), ref_weighting.UnitWeighting(), SIGMAS),
    (ntd.EpsWeighting(), ref_weighting.EpsWeighting(), SIGMAS),
    (ntd.EDMWeighting(sigma_data=0.5), ref_weighting.EDMWeighting(sigma_data=0.5), SIGMAS),
    (ntd.RectifiedFlowWeighting(m=0.1, s=1.2), ref_weighting.RectifiedFlowWeighting(m=0.1, s=1.2), SIGMAS),
    (
        ntd.RectifiedFlowComfyWeighting(m=0.1, s=1.2),
        ref_weighting.RectifiedFlowComfyWeighting(m=0.1, s=1.2),
        RF_SIGMAS,
    ),
    (
        ntd.MinSNRGammaModifier(ntd.EpsWeighting(), gamma=5.0, v_pred=False),
        ref_weighting.MinSNRGammaModifier(ref_weighting.EpsWeighting(), gamma=5.0, v_pred=False),
        SIGMAS,
    ),
    (
        ntd.MinSNRGammaModifier(ntd.UnitWeighting(), gamma=5.0, v_pred=True),
        ref_weighting.MinSNRGammaModifier(ref_weighting.UnitWeighting(), gamma=5.0, v_pred=True),
        SIGMAS,
    ),
]


@pytest.mark.parametrize("ours,theirs,sig", WEIGHT_PAIRS, ids=lambda p: type(p).__name__)
def test_weighting_parity(ours, theirs, sig):
    ours_out = np.asarray(ours(np.asarray(sig)))
    theirs_out = theirs(_t(sig)).to(dtype=__import__("torch").float32).numpy()
    np.testing.assert_allclose(ours_out, theirs_out, rtol=2e-4, atol=1e-6)


DISCRET_PAIRS = [
    (ntd.EDMcDiscretization(), ref_discret.EDMcDiscretization()),
    (ntd.EDMcSimpleDiscretization(), ref_discret.EDMcSimpleDiscretization()),
    (ntd.RectifiedFlowDiscretization(), ref_discret.RectifiedFlowDiscretization()),
    (ntd.RectifiedFlowComfyDiscretization(), ref_discret.RectifiedFlowComfyDiscretization()),
    (ntd.TanZeroSNRDiscretization(), ref_discret.TanZeroSNRDiscretization()),
    (ntd.EDMDiscretization(), ref_discret.EDMDiscretization()),
    (ntd.LegacyDDPMDiscretization(), ref_discret.LegacyDDPMDiscretization()),
]


@pytest.mark.parametrize("n", [50, 1000])
@pytest.mark.parametrize("ours,theirs", DISCRET_PAIRS, ids=lambda p: type(p).__name__)
def test_discretization_parity(ours, theirs, n):
    ours_out = np.asarray(ours(n))
    if isinstance(theirs, ref_discret.LegacyDDPMDiscretization) and n < 1000:
        # the reference's subsampled path trips torch's negative-stride numpy
        # indexing in this torch version; compute its intended golden by hand
        ts = ref_discret.generate_roughly_equally_spaced_steps(n, 1000).copy()
        acp = theirs.alphas_cumprod[ts].detach().numpy()
        sig = ((1 - acp) / acp) ** 0.5
        theirs_out = np.concatenate([sig[::-1], [0.0]]).astype(np.float32)
    else:
        theirs_out = theirs(n).detach().numpy()
    np.testing.assert_allclose(ours_out, theirs_out, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("flip", [False, True])
def test_discretization_flip(flip):
    ours = np.asarray(ntd.EDMDiscretization()(20, flip=flip))
    theirs = ref_discret.EDMDiscretization()(20, flip=flip).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_edm_sigma_generator_with_t_parity():
    t = np.random.RandomState(0).rand(64).astype(np.float32)
    ours = np.asarray(ntd.EDMSigmaGenerator()(64, t))
    theirs = ref_sigma.EDMSigmaGenerator()(64, _t(t)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_rf_sigma_generator_with_t_parity():
    t = np.random.RandomState(1).rand(64)
    ours = np.asarray(ntd.RectifiedFlowSigmaGenerator()(64, t.astype(np.float32)))
    theirs = ref_sigma.RectifiedFlowSigmaGenerator()(64, _t(t)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)
    ours_c = np.asarray(ntd.RectifiedFlowComfySigmaGenerator()(64, t.astype(np.float32)))
    theirs_c = ref_sigma.RectifiedFlowComfySigmaGenerator()(64, _t(t)).numpy()
    np.testing.assert_allclose(ours_c, theirs_c, rtol=1e-5)


def test_tan_sigma_generator_with_t_parity():
    t = np.random.RandomState(2).rand(64)
    ours = np.asarray(ntd.TanScheduleSigmaGenerator()(64, t.astype(np.float32)))
    theirs = ref_sigma.TanScheduleSigmaGenerator()(64, _t(t)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3)


def test_cosine_sigma_generator_with_t_parity():
    t = np.clip(np.random.RandomState(3).rand(64).astype(np.float32), 0.001, 1.0)
    ours = np.asarray(ntd.CosineScheduleSigmaGenerator()(64, t))
    theirs = ref_sigma.CosineScheduleSigmaGenerator()(64, _t(t)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)


def test_discrete_sigma_generator_uniform_indices():
    """Our documented deviation: fractional t maps to uniform indices over the table."""
    gen = ntd.DiscreteSigmaGenerator(ntd.LegacyDDPMDiscretization(), num_idx=1000)
    t = np.linspace(0.0, 0.999, 64, dtype=np.float32)
    sig = np.asarray(gen(64, t))
    table = np.asarray(gen.sigmas)
    idx = np.clip((t * 1000).astype(np.int64), 0, 999)
    np.testing.assert_allclose(sig, table[idx], rtol=1e-6)


def test_discrete_sigma_generator_excludes_zero_by_default():
    """The reference fork's default table is [0, sigma_min..sigma_max] with
    sigma=0 drawable at p=1/num_idx — 0*inf = NaN under eps weighting
    (reference sigma_generators.py:43 + denoiser_weighting.py Eps). Our
    default drops the zero (upstream-sgm training semantics); the
    reference-fork layout stays available with exclude_zero=False."""
    gen = ntd.DiscreteSigmaGenerator(ntd.LegacyDDPMDiscretization(), num_idx=1000)
    table = np.asarray(gen.sigmas)
    assert table.shape == (1000,)
    assert table.min() > 0.0
    assert table[0] == table.min() and table[-1] == table.max()

    quirk = ntd.DiscreteSigmaGenerator(
        ntd.LegacyDDPMDiscretization(), num_idx=1000, exclude_zero=False
    )
    qtable = np.asarray(quirk.sigmas)
    assert qtable.shape == (1001,)
    assert qtable[0] == 0.0
    np.testing.assert_allclose(qtable[1:], table, rtol=0)
    # eps weighting at the zero draw is the NaN: w = sigma^-2, mse = 0 exactly
    w = np.asarray(ntd.EpsWeighting()(np.asarray([0.0], np.float32)))
    assert np.isinf(w)[0]


def test_discrete_denoiser_quantization():
    disc = ntd.LegacyDDPMDiscretization()
    den = ntd.DiscreteDenoiser(ntd.EpsPreconditioning(), 1000, disc)
    import jax.numpy as jnp

    sigma = jnp.asarray([0.5, 3.0])
    q = den.possibly_quantize_sigma(sigma)
    table = np.asarray(den.sigmas)
    # quantized sigmas must be entries of the table, nearest to the input
    for s, qq in zip(np.asarray(sigma), np.asarray(q)):
        assert np.abs(table - qq).min() < 1e-7
        assert np.abs(qq - s) == pytest.approx(np.abs(table - s).min(), rel=1e-5)


def test_denoiser_eps_identity():
    """With Eps preconditioning, D(x; sigma) = x - sigma * net(x / sqrt(1+sigma^2), sigma)."""
    import jax.numpy as jnp

    den = ntd.Denoiser(ntd.EpsPreconditioning())
    x = jnp.ones((2, 4, 8, 8))
    sigma = jnp.asarray([0.5, 2.0])

    def network_apply(x_in, c_noise, cond):
        return x_in * 2.0

    out = den(network_apply, x, sigma, {})
    sig_bc = sigma[:, None, None, None]
    expect = (x / jnp.sqrt(sig_bc**2 + 1) * 2.0) * (-sig_bc) + x
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5)


def test_standard_diffusion_loss_runs_and_weights():
    import jax
    import jax.numpy as jnp

    loss_fn = ntd.StandardDiffusionLoss(
        sigma_generator=ntd.EDMSigmaGenerator(),
        loss_weighting=ntd.EpsWeighting(),
        loss_type="l2",
    )
    den = ntd.Denoiser(ntd.EpsPreconditioning())
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 8, 8))

    def network_apply(x_in, c_noise, cond):
        return jnp.zeros_like(x_in)

    loss, aux = loss_fn(network_apply, den, {}, x, jax.random.PRNGKey(1), return_dict=True)
    assert loss.shape == (4,)
    assert jnp.all(jnp.isfinite(loss))
    # with net=0 and eps weighting: D = x (c_skip=1, c_out*0), target x -> loss per
    # sample = mse(x+sigma*eps*0... ) actually D = z_t*c_skip + 0 = x + sigma*eps,
    # mse = mean(sigma^2 eps^2) * sigma^-2 ~ 1
    assert np.asarray(loss).mean() == pytest.approx(1.0, rel=0.35)


def test_loss_jittable():
    import jax
    import jax.numpy as jnp

    loss_fn = ntd.StandardDiffusionLoss(
        sigma_generator=ntd.RectifiedFlowSigmaGenerator(),
        loss_weighting=ntd.UnitWeighting(),
        objective_type="rf",
        noise_offset=0.05,
        noise_offset_chance=0.5,
    )
    den = ntd.Denoiser(ntd.RectifiedFlowXLPreconditioning())

    def network_apply(x_in, c_noise, cond):
        return jnp.tanh(x_in)

    @jax.jit
    def step(x, key):
        return loss_fn(network_apply, den, {}, x, key).mean()

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    v1 = step(x, jax.random.PRNGKey(1))
    v2 = step(x, jax.random.PRNGKey(1))
    assert np.asarray(v1) == pytest.approx(np.asarray(v2))
    assert np.isfinite(np.asarray(v1))
