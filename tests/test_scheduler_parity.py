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

    # cosine.py imports a type alias from neurosis.optimizers.types;
    # linear.py imports ensure_list from neurosis.utils
    if "neurosis.optimizers.types" not in sys.modules:
        t = types.ModuleType("neurosis.optimizers.types")
        t.ParamGroup = dict
        sys.modules["neurosis.optimizers.types"] = t
    u = sys.modules.get("neurosis.utils")
    if u is None:
        u = types.ModuleType("neurosis.utils")
        sys.modules["neurosis.utils"] = u
    if not hasattr(u, "ensure_list"):
        u.ensure_list = lambda x, n=1: list(x) if isinstance(x, (list, tuple)) else [x] * n
    # schedulers package context so `.base` relative imports resolve
    if "neurosis.schedulers" not in sys.modules:
        pkg = types.ModuleType("neurosis.schedulers")
        pkg.__path__ = ["/root/reference/src/neurosis/schedulers"]
        sys.modules["neurosis.schedulers"] = pkg
        _load("neurosis.schedulers.base", "schedulers/base.py")
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


def test_lambda_interval_schedulers():
    """LambdaWarmUpCosineScheduler2 + LambdaLinearScheduler (linear.py) are
    plain step→multiplier callables — compare across two cycles."""
    lin = _ref_mod("ref_sched_linear", "schedulers/linear.py")
    from neurosis_tpu.schedulers import (
        lambda_linear_scheduler,
        lambda_warmup_cosine_scheduler2,
    )

    kw = dict(
        warm_up_steps=[10, 5],
        f_min=[0.1, 0.05],
        f_max=[1.0, 0.8],
        f_start=[0.0, 0.0],
        cycle_lengths=[50, 40],
    )
    ref_cos = lin.LambdaWarmUpCosineScheduler2(**kw)
    our_cos = lambda_warmup_cosine_scheduler2(**kw)
    ref_lin = lin.LambdaLinearScheduler(**kw)
    our_lin = lambda_linear_scheduler(**kw)
    for n in range(0, 90):
        np.testing.assert_allclose(our_cos(n), ref_cos(n), rtol=1e-6, err_msg=f"cos step {n}")
        np.testing.assert_allclose(our_lin(n), ref_lin(n), rtol=1e-6, err_msg=f"lin step {n}")


def test_warmup_schedule_callables():
    """CosineWarmupSchedule[Staged] (warmup.py) schedule() parity."""
    warm = _ref_mod("neurosis.schedulers.warmup", "schedulers/warmup.py")
    from neurosis_tpu.schedulers import cosine_warmup_schedule

    kw = dict(warm_up_steps=8, max_decay_steps=64, lr_min=0.05, lr_max=1.0, lr_start=0.01)
    ref = warm.CosineWarmupSchedule(**kw)
    ours = cosine_warmup_schedule(**kw)
    for n in range(0, 80):
        np.testing.assert_allclose(ours(n), ref.schedule(n), rtol=1e-6, err_msg=f"step {n}")
