"""NeurosisProfiler: schedule windows, trace capture, module spans, summary.

Parity targets: reference trainer/profile/profiler.py — ProfilerSchedule
(31-56), RecordModuleNames "[mod]" spans with max_depth (236-299), and the
key_averages().table() summary (177-188).
"""

import jax
import jax.numpy as jnp
import pytest

flax = pytest.importorskip("flax")
from flax import linen as nn  # noqa: E402

from neurosis_tpu.trainer.profile import NeurosisProfiler, ProfilerSchedule
from neurosis_tpu.utils.profiling import record_module_names


class Block(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(64)(nn.silu(nn.Dense(64, name="inner")(x)))


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = Block(name=f"block_{i}")(x)
        return x


def test_schedule_phases():
    s = ProfilerSchedule(skip_first=1, wait=1, warmup=1, active=2, repeat=1)
    assert [s.phase(i) for i in range(6)] == [
        "skip", "wait", "warmup", "active", "active", "done",
    ]


def test_record_module_names_spans_and_depth():
    """The interceptor attaches depth-limited [mod]path(Class) named scopes —
    visible in the jitted function's HLO metadata (= what the on-chip trace's
    tf_op field carries)."""
    m = Net()
    x = jnp.ones((4, 64))
    p = m.init(jax.random.PRNGKey(0), x)

    with record_module_names():
        hlo = jax.jit(m.apply).lower(p, x).as_text(debug_info=True)
    assert "[mod]block_0(Block)" in hlo
    assert "[mod]block_0.inner(Dense)" in hlo

    # max_depth=1: top-level modules only, inner Dense spans filtered
    with record_module_names(max_depth=1):
        hlo = jax.jit(m.apply).lower(p, x).as_text(debug_info=True)
    assert "[mod]block_0(Block)" in hlo
    assert "[mod]block_0.inner(Dense)" not in hlo

    # scopes are metadata-only: results identical
    y_plain = m.apply(p, x)
    with record_module_names():
        y_scoped = m.apply(p, x)
    assert jnp.array_equal(y_plain, y_scoped)


def test_profiler_trace_and_summary(tmp_path):
    """Step-windowed trace capture + device-time-sorted key-average table."""
    m = Net()
    x = jnp.ones((64, 64))
    p = m.init(jax.random.PRNGKey(0), x)
    prof = NeurosisProfiler(
        str(tmp_path), ProfilerSchedule(skip_first=0, wait=0, warmup=1, active=2, repeat=1)
    )
    f = jax.jit(m.apply)
    for _ in range(5):
        f(p, x).block_until_ready()
        prof.step()
    prof.stop()

    assert prof.trace_dir is not None and prof.trace_dir.exists()
    rows = prof.key_averages(by="op")
    assert rows, "no device events parsed from the trace"
    assert any("dot" in r["key"] for r in rows)
    # sorted by total device time descending
    times = [r["device_time_us"] for r in rows]
    assert times == sorted(times, reverse=True)

    table = prof.summary()
    assert "op key averages" in table
    assert rows[0]["key"][:60] in table
    # row_limit honored
    assert len(table.splitlines()) <= 2 * (prof.row_limit + 2) + 1


def test_trainer_enters_module_name_recording(monkeypatch, tmp_path):
    """Trainer.fit wraps tracing in record_module_names when a profiler
    callback asks for it (profiler.py:151-153 auto-activation parity)."""
    import neurosis_tpu.trainer.loop as loop_mod
    from neurosis_tpu.utils import profiling

    entered = []
    real_rmn = profiling.record_module_names

    def fake_rmn(depth=-1):
        entered.append(depth)
        return real_rmn(depth)

    monkeypatch.setattr(profiling, "record_module_names", fake_rmn)

    prof = NeurosisProfiler(str(tmp_path), capture_depth=3)
    trainer = loop_mod.Trainer.__new__(loop_mod.Trainer)
    trainer.callbacks = [prof]
    trainer.mesh = object()  # non-None → skip _build_mesh
    trainer.engine = object()  # no g_step attr

    def fake_fit_diffusion(batch_iter_factory):
        return "ran", None

    trainer._fit_diffusion = fake_fit_diffusion
    # mesh context manager stub
    class _Mesh:
        shape = {}

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    trainer.mesh = _Mesh()
    out = trainer.fit(lambda: iter(()))
    assert out == ("ran", None)
    assert entered == [3]
