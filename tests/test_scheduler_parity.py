"""Golden parity: LR schedules vs the reference torch LRSchedulers, driven
step-by-step through real torch optimizers."""

import pathlib as _pl

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not _pl.Path("/root/reference/src/neurosis").exists(), reason="reference tree not mounted"
)


def _ref_mod(name, rel):
    import sys
    import types

    sys.path.insert(0, "tests")
    from _reference_loader import _load

    # cosine.py imports a type alias from neurosis.optimizers.types
    if "neurosis.optimizers.types" not in sys.modules:
        t = types.ModuleType("neurosis.optimizers.types")
        t.ParamGroup = dict
        sys.modules["neurosis.optimizers.types"] = t
    return _load(name, rel)


def _drive(scheduler, steps):
    """Step a torch scheduler and collect the param-group lr per step."""
    lrs = []
    for _ in range(steps):
        lrs.append(scheduler.optimizer.param_groups[0]["lr"])
        scheduler.optimizer.step()
        scheduler.step()
    return np.asarray(lrs)


@pytest.fixture()
def lr_scheduler_verbose_shim(monkeypatch):
    """torch>=2.4 dropped the `verbose` positional from LRScheduler.__init__
    that the reference passes; accept-and-drop it for the parity run."""
    import inspect

    import torch.optim.lr_scheduler as lrs

    orig = lrs.LRScheduler.__init__
    if "verbose" not in inspect.signature(orig).parameters:
        def patched(self, optimizer, last_epoch=-1, verbose=False):
            orig(self, optimizer, last_epoch)

        monkeypatch.setattr(lrs.LRScheduler, "__init__", patched)
    yield


@pytest.mark.parametrize("cycle_mult", [1.0, 2.0])
def test_legacy_cosine_annealing_warmup_restarts(cycle_mult, lr_scheduler_verbose_shim):
    import torch

    cosine = _ref_mod("ref_sched_cosine", "schedulers/cosine.py")
    from neurosis_tpu.schedulers import legacy_cosine_annealing_warmup_restarts

    max_lr, min_lr, first, warm, gamma, steps = 3e-4, 1e-6, 20, 5, 0.8, 100
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=max_lr)
    ref = cosine.LegacyCosineAnnealingWarmupRestarts(
        opt, first_cycle_steps=first, cycle_mult=cycle_mult, min_lr=min_lr,
        warm_up_steps=warm, gamma=gamma,
    )
    ref_lrs = _drive(ref, steps)

    ours = legacy_cosine_annealing_warmup_restarts(
        first_cycle_steps=first, cycle_mult=cycle_mult, min_lr=min_lr,
        warm_up_steps=warm, gamma=gamma, max_lr=max_lr,
    )
    our_lrs = np.asarray([ours(s) for s in range(steps)])
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-6, atol=1e-12)


def test_cosine_with_warmup_hf():
    import torch

    hf = _ref_mod("ref_sched_hf", "schedulers/hf.py")
    from neurosis_tpu.schedulers import cosine_with_warmup

    warm, total, steps = 10, 80, 80
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    ref = hf.CosineWithWarmUp(opt, num_warmup_steps=warm, num_training_steps=total)
    ref_lrs = _drive(ref, steps)

    f = cosine_with_warmup(num_warmup_steps=warm, num_training_steps=total)
    our_lrs = np.asarray([f(s) for s in range(steps)])
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-6, atol=1e-12)
