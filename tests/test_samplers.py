"""Golden parity: JAX samplers vs the reference torch samplers on a toy denoiser."""

import numpy as np
import pytest

# reference-parity tests need the read-only reference checkout
import pathlib as _pl

pytestmark = pytest.mark.skipif(
    not _pl.Path("/root/reference/src/neurosis").exists(), reason="reference tree not mounted"
)

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurosis_tpu.diffusion import LegacyDDPMDiscretization  # noqa: E402
from neurosis_tpu.sampling import (  # noqa: E402
    DPMPP2MSampler,
    DPMPP2SAncestralSampler,
    EulerAncestralSampler,
    EulerEDMSampler,
    HeunEDMSampler,
    IdentityGuider,
    LinearMultistepSampler,
    VanillaCFG,
)


def _load_ref_sampling():
    import sys
    sys.path.insert(0, "tests")
    from _reference_loader import REF_SRC, _load  # noqa: F401
    import types
    import torch

    # stubs for the sampling module's imports
    utils_stub = sys.modules.get("neurosis.utils")
    if utils_stub is None:
        utils_stub = types.ModuleType("neurosis.utils")
        sys.modules["neurosis.utils"] = utils_stub
    utils_stub.append_zero = lambda x: torch.cat([x, x.new_zeros([1])])
    def _append_dims(x, n):
        import torch as _t

        if not hasattr(x, "ndim"):
            x = _t.tensor(x)
        return x[(...,) + (None,) * (n - x.ndim)]

    utils_stub.append_dims = _append_dims

    for name, rel in [
        ("neurosis.modules.diffusion.util", "modules/diffusion/util.py"),
        ("neurosis.modules.diffusion.discretization", "modules/diffusion/discretization.py"),
        ("neurosis.modules.diffusion.denoiser_preconditioning", "modules/diffusion/denoiser_preconditioning.py"),
    ]:
        if name not in sys.modules:
            pkgname = name.rsplit(".", 1)[0]
            if pkgname not in sys.modules:
                pkg = types.ModuleType(pkgname)
                pkg.__path__ = [str(REF_SRC / pkgname.replace("neurosis.", "").replace(".", "/"))]
                sys.modules[pkgname] = pkg
            _load(name, rel)
    if "neurosis.modules.diffusion.denoiser" not in sys.modules:
        _load("neurosis.modules.diffusion.denoiser", "modules/diffusion/denoiser.py")
    if "neurosis.modules.guidance" not in sys.modules:
        _load("neurosis.modules.guidance", "modules/guidance.py")
    pkg = sys.modules.setdefault("neurosis.modules.diffusion.sampling", types.ModuleType("neurosis.modules.diffusion.sampling"))
    pkg.__path__ = [str(REF_SRC / "modules/diffusion/sampling")]
    if "neurosis.modules.diffusion.sampling.utils" not in sys.modules:
        _load("neurosis.modules.diffusion.sampling.utils", "modules/diffusion/sampling/utils.py")
    # load under the real dotted name so `from ..denoiser import` resolves
    return _load("neurosis.modules.diffusion.sampling.sampling", "modules/diffusion/sampling/sampling.py")


def _toy_denoise_np(x, sigma):
    # smooth fake D-output: shrink towards 0 as sigma grows
    s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
    return x / (1.0 + s)


@pytest.mark.parametrize(
    "name,ours_cls,ref_name,kwargs",
    [
        ("euler", EulerEDMSampler, "EulerEDMSampler", {}),
        ("heun", HeunEDMSampler, "HeunEDMSampler", {}),
        ("dpmpp2m", DPMPP2MSampler, "DPMPP2MSampler", {}),
        # deterministic at eta=0: golden-tests the full ancestral math
        # (sigma_down split, dpm++2s midpoint) minus only the noise draw
        ("euler_ancestral", EulerAncestralSampler, "EulerAncestralSampler", {"eta": 0.0}),
        ("dpmpp2s_ancestral", DPMPP2SAncestralSampler, "DPMPP2SAncestralSampler", {"eta": 0.0}),
        # LMS is deterministic (scipy quadrature coefficients)
        ("lms", LinearMultistepSampler, "LinearMultistepSampler", {"order": 4}),
    ],
)
def test_sampler_parity(name, ours_cls, ref_name, kwargs):
    import torch

    ref_mod = _load_ref_sampling()
    import sys as _sys

    ref_discret = _sys.modules["neurosis.modules.diffusion.discretization"]
    # newer torch rejects negative-stride numpy index arrays; make them contiguous
    _orig_steps = ref_discret.generate_roughly_equally_spaced_steps

    def _contig(*a, **k):
        return np.ascontiguousarray(_orig_steps(*a, **k))

    ref_discret.generate_roughly_equally_spaced_steps = _contig

    steps = 8
    x0 = np.random.RandomState(0).randn(2, 4, 4, 3).astype(np.float32)

    # reference: torch, NCHW irrelevant for the toy denoiser
    rd = ref_discret.LegacyDDPMDiscretization()
    ref = getattr(ref_mod, ref_name)(discretization=rd, num_steps=steps, device="cpu", **kwargs)

    def ref_denoiser(x, sigma, cond, *args, **kw):
        # some reference samplers pass an extra output-mode positional ("D")
        return torch.from_numpy(_toy_denoise_np(x.numpy(), sigma.numpy()))

    with torch.no_grad():
        ref_out = ref(ref_denoiser, torch.from_numpy(x0.copy()), cond={}, uc=None).numpy()

    ours = ours_cls(
        discretization=LegacyDDPMDiscretization(), guider=IdentityGuider(), num_steps=steps, **kwargs
    )

    def our_denoiser(x, sigma, cond):
        s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
        return x / (1.0 + s)

    out = ours(our_denoiser, jnp.asarray(x0), cond={}, uc=None)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-3, rtol=2e-3)


def test_vanilla_cfg_matches_reference_math():
    # CFG lerp: u + scale*(c - u) over a doubled batch
    g = VanillaCFG(scale=5.0)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 2, 2, 3).astype(np.float32))
    out = g(x, jnp.ones((2,)))
    x_u, x_c = np.split(np.asarray(x), 2, axis=0)
    np.testing.assert_allclose(np.asarray(out), x_u + 5.0 * (x_c - x_u), rtol=1e-6)


def test_euler_ancestral_runs():
    ours = EulerAncestralSampler(
        discretization=LegacyDDPMDiscretization(), guider=IdentityGuider(), num_steps=6
    )

    def our_denoiser(x, sigma, cond):
        s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
        return x / (1.0 + s)

    x0 = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3).astype(np.float32))
    out = ours(our_denoiser, x0, cond={}, uc=None, rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


def test_euler_ancestral_exact_noise_parity(monkeypatch):
    """Full ancestral path at eta=1 with an injected deterministic noise
    source on both sides (noise_sampler / torch.randn_like patch)."""
    import torch

    ref_mod = _load_ref_sampling()
    import sys as _sys

    ref_discret = _sys.modules["neurosis.modules.diffusion.discretization"]
    steps = 8
    x0 = np.random.RandomState(1).randn(2, 4, 4, 3).astype(np.float32)

    monkeypatch.setattr(torch, "randn_like", lambda t: torch.full_like(t, 0.5))
    rd = ref_discret.LegacyDDPMDiscretization()
    ref = ref_mod.EulerAncestralSampler(discretization=rd, num_steps=steps, device="cpu", eta=1.0)

    def ref_denoiser(x, sigma, cond, *args, **kw):
        return torch.from_numpy(_toy_denoise_np(x.numpy(), sigma.numpy()))

    with torch.no_grad():
        ref_out = ref(ref_denoiser, torch.from_numpy(x0.copy()), cond={}, uc=None).numpy()

    ours = EulerAncestralSampler(
        discretization=LegacyDDPMDiscretization(),
        guider=IdentityGuider(),
        num_steps=steps,
        eta=1.0,
        noise_sampler=lambda key, shape, dtype=None: jnp.full(shape, 0.5, dtype or jnp.float32),
    )

    def our_denoiser(x, sigma, cond):
        s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
        return x / (1.0 + s)

    out = ours(our_denoiser, jnp.asarray(x0), cond={}, uc=None)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-3, rtol=2e-3)
