"""Golden parity: LitEma shadow tracking and the Adafactor optimizer vs the
reference torch implementations driven on identical parameter trajectories."""

import pathlib as _pl

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not _pl.Path("/root/reference/src/neurosis").exists(), reason="reference tree not mounted"
)

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _load(name, rel):
    import sys
    import types

    sys.path.insert(0, "tests")
    from _reference_loader import _load as load

    # adafactor.py does `from .types import ...` — give it a package context
    if rel.startswith("optimizers/") and "neurosis.optimizers" not in sys.modules:
        pkg = types.ModuleType("neurosis.optimizers")
        pkg.__path__ = ["/root/reference/src/neurosis/optimizers"]
        sys.modules["neurosis.optimizers"] = pkg
        load("neurosis.optimizers.types", "optimizers/types.py")
    if rel.startswith("optimizers/"):
        return load(f"neurosis.optimizers.{name.split('_')[-1]}", rel)
    return load(name, rel)


def test_litema_shadow_parity():
    """20 updates with the warmup decay min(decay, (1+n)/(10+n)): shadows
    match the reference LitEma exactly."""
    import torch

    ema_mod = _load("ref_ema", "modules/ema.py")
    from neurosis_tpu.modules.ema import ema_init, ema_update

    torch.manual_seed(0)
    model = torch.nn.Linear(4, 3)
    ref_ema = ema_mod.LitEma(model, decay=0.999, use_num_updates=True)

    # .copy(): jax CPU zero-copies numpy views, and model.weight.numpy() is a
    # view of the torch storage — without the copy the in-place torch update
    # would mutate the "jax" tree too
    params = {
        "weight": jnp.asarray(model.weight.detach().numpy().copy()),
        "bias": jnp.asarray(model.bias.detach().numpy().copy()),
    }
    state = ema_init(params, use_num_updates=True)

    rng = np.random.RandomState(1)
    for _ in range(20):
        dw = rng.randn(3, 4).astype(np.float32) * 0.05
        db = rng.randn(3).astype(np.float32) * 0.05
        with torch.no_grad():
            model.weight += torch.from_numpy(dw)
            model.bias += torch.from_numpy(db)
        ref_ema(model)
        params = {"weight": params["weight"] + dw, "bias": params["bias"] + db}
        state = ema_update(state, params, decay=0.999)

    shadows = dict(ref_ema.named_buffers())
    np.testing.assert_allclose(
        np.asarray(state.params["weight"]), shadows["weight"].numpy(), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(state.params["bias"]), shadows["bias"].numpy(), rtol=1e-5, atol=1e-7
    )


def test_adafactor_trajectory_parity():
    """20 steps on identical grads: our optax Adafactor (factored second
    moments, relative-step lr, update clipping) tracks the reference torch
    Adafactor."""
    import torch

    ada_mod = _load("ref_adafactor", "optimizers/adafactor.py")
    from neurosis_tpu.optimizers import Adafactor

    torch.manual_seed(0)
    w0 = np.random.RandomState(2).randn(8, 6).astype(np.float32)
    p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    ref_opt = ada_mod.Adafactor(
        [p_t], scale_parameter=True, relative_step=True, warmup_init=False
    )

    opt = Adafactor(scale_parameter=True, relative_step=True, warmup_init=False)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)

    rng = np.random.RandomState(3)
    for _ in range(20):
        g = rng.randn(8, 6).astype(np.float32) * 0.1
        p_t.grad = torch.from_numpy(g.copy())
        ref_opt.step()
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}

    np.testing.assert_allclose(
        np.asarray(params["w"]), p_t.detach().numpy(), rtol=2e-4, atol=2e-6
    )


def test_came_trajectory_parity():
    """20 steps on identical grads: our optax CAME tracks the reference torch
    CAME (pytorch_optimizer base stubbed — not installed here)."""
    import sys
    import types

    import torch

    # stub the pytorch_optimizer base surface the reference subclasses
    if "pytorch_optimizer.base.optimizer" not in sys.modules:
        base = types.ModuleType("pytorch_optimizer.base")
        exc = types.ModuleType("pytorch_optimizer.base.exception")

        class NoSparseGradientError(Exception):
            def __init__(self, name):
                super().__init__(name)

        exc.NoSparseGradientError = NoSparseGradientError
        optmod = types.ModuleType("pytorch_optimizer.base.optimizer")

        class BaseOptimizer:
            @staticmethod
            def validate_learning_rate(lr):
                assert lr >= 0

            @staticmethod
            def validate_betas(betas):
                assert all(0 <= b < 1 for b in betas)

            @staticmethod
            def validate_non_negative(x, name):
                assert x >= 0

            @staticmethod
            def apply_weight_decay(p, grad, lr, weight_decay, weight_decouple, fixed_decay):
                # pytorch_optimizer semantics: decoupled -> p *= (1 - lr*wd)
                if weight_decay == 0.0:
                    return
                if weight_decouple:
                    p.mul_(1.0 - (weight_decay if fixed_decay else lr * weight_decay))
                else:
                    grad.add_(p, alpha=weight_decay)

        optmod.BaseOptimizer = BaseOptimizer
        typesmod = types.ModuleType("pytorch_optimizer.base.types")
        typesmod.BETAS = tuple
        typesmod.CLOSURE = object
        typesmod.DEFAULTS = dict
        typesmod.LOSS = float
        typesmod.PARAMETERS = list
        root = types.ModuleType("pytorch_optimizer")
        sys.modules["pytorch_optimizer"] = root
        sys.modules["pytorch_optimizer.base"] = base
        sys.modules["pytorch_optimizer.base.exception"] = exc
        sys.modules["pytorch_optimizer.base.optimizer"] = optmod
        sys.modules["pytorch_optimizer.base.types"] = typesmod
    # came.py does `from .utils import copy_stochastic_`
    if "neurosis.optimizers" not in sys.modules:
        pkg = types.ModuleType("neurosis.optimizers")
        pkg.__path__ = ["/root/reference/src/neurosis/optimizers"]
        sys.modules["neurosis.optimizers"] = pkg
    sys.path.insert(0, "tests")
    from _reference_loader import _load as load

    if "neurosis.optimizers.utils" not in sys.modules:
        load("neurosis.optimizers.utils", "optimizers/utils.py")
    came_mod = load("neurosis.optimizers.came", "optimizers/came.py")

    from neurosis_tpu.optimizers import came

    w0 = np.random.RandomState(4).randn(8, 6).astype(np.float32)
    p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    ref_opt = came_mod.CAME([p_t], lr=1e-3, weight_decay=0.0)

    opt = came(learning_rate=1e-3, weight_decay=0.0)
    params = {"w": jnp.asarray(w0.copy())}
    state = opt.init(params)

    rng = np.random.RandomState(5)
    for _ in range(20):
        g = rng.randn(8, 6).astype(np.float32) * 0.1
        p_t.grad = torch.from_numpy(g.copy())
        ref_opt.step()
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}

    np.testing.assert_allclose(
        np.asarray(params["w"]), p_t.detach().numpy(), rtol=2e-4, atol=2e-6
    )
