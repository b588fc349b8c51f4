"""stacked() optimizer wrapper == per-leaf inner transform, exactly.

The wrapper only changes HOW updates are computed (vmapped over shape groups),
never WHAT — slices inside vmap see the original leaf shapes, so factored-dim
selection, parameter scaling, and count-based schedules are unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neurosis_tpu.optimizers import Adafactor
from neurosis_tpu.optimizers.stacked import stacked


def make_tree(seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32)).astype(dtype)
    return {
        "conv1": {"kernel": mk(3, 3, 8, 16), "bias": mk(16)},
        "conv2": {"kernel": mk(3, 3, 8, 16), "bias": mk(16)},
        "dense": {"kernel": mk(32, 64), "bias": mk(64)},
        "norm": {"scale": mk(16), "bias": mk(16)},
        "lone": mk(5, 7),  # singleton shape group
    }


@pytest.mark.parametrize("make_opt", [
    lambda: Adafactor(),
    lambda: optax.adamw(1e-3),
    # NOTE: tree-global transforms (clip_by_global_norm) must compose OUTSIDE
    # stacked() — see test_stacked_clip_by_global_norm_is_per_leaf_semantics
    lambda: optax.chain(optax.clip(1.0), optax.adam(1e-3)),
], ids=["adafactor", "adamw", "chain-clip-adam"])
def test_stacked_matches_per_leaf(make_opt):
    params = make_tree(0)
    plain, batched = make_opt(), stacked(make_opt())

    s_plain = jax.jit(plain.init)(params)
    s_stack = jax.jit(batched.init)(params)

    def make_step(opt):
        @jax.jit
        def step(p, s, g):
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s

        return step

    step_plain, step_stack = make_step(plain), make_step(batched)
    p1, p2 = params, params
    for i in range(3):
        grads = make_tree(100 + i)
        p1, s_plain = step_plain(p1, s_plain, grads)
        p2, s_stack = step_stack(p2, s_stack, grads)

    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_leaves_with_path(p1), jax.tree_util.tree_leaves_with_path(p2)
    ):
        assert k1 == k2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7, err_msg=str(k1))


def test_stacked_clip_by_global_norm_is_per_leaf_semantics():
    """Document the one semantic difference: tree-global transforms (e.g.
    clip_by_global_norm) become per-leaf under vmap when wrapped directly.
    Global transforms must stay OUTSIDE: chain(global_clip, stacked(adam))."""
    params = {"a": jnp.ones((4, 4)) * 3.0, "b": jnp.ones((4, 4)) * 4.0}
    grads = {"a": jnp.ones((4, 4)) * 3.0, "b": jnp.ones((4, 4)) * 4.0}

    outer = optax.chain(optax.clip_by_global_norm(1.0), stacked(optax.sgd(1.0)))
    s = outer.init(params)
    u, _ = outer.update(grads, s, params)
    # global norm = 5 * 4 = 20 -> everything scaled by 1/20
    np.testing.assert_allclose(np.asarray(u["a"]), -3.0 / 20.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u["b"]), -4.0 / 20.0, rtol=1e-6)


def test_stacked_size_cutoff_matches():
    """Groups above max_stack_elems take the plain per-leaf path — same math."""
    params = make_tree(5)
    plain = Adafactor()
    batched = stacked(Adafactor(), max_stack_elems=300)  # biases stack, kernels don't
    g = make_tree(6)
    u1, _ = jax.jit(plain.update)(g, plain.init(params), params)
    u2, _ = jax.jit(batched.update)(g, batched.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(u1), jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_stacked_rejects_tree_change():
    opt = stacked(optax.adam(1e-3))
    params = make_tree(1)
    s = opt.init(params)
    bad = dict(params)
    bad["extra"] = jnp.ones((2, 2))
    with pytest.raises(ValueError):
        opt.update(bad, s, bad)


def test_stacked_bf16_params():
    params = make_tree(2, dtype=jnp.bfloat16)
    plain, batched = Adafactor(), stacked(Adafactor())
    g = make_tree(3, dtype=jnp.bfloat16)
    u1, _ = jax.jit(plain.update)(g, plain.init(params), params)
    u2, _ = jax.jit(batched.update)(g, batched.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(u1), jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-2, atol=1e-6
        )


def test_apply_updates_stochastic():
    """Stochastic bf16 apply: unbiased in expectation where deterministic
    rounding loses the update entirely."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neurosis_tpu.optimizers.utils import apply_updates_stochastic

    p = {"w": jnp.full((4096,), 1.0, jnp.bfloat16), "b": jnp.zeros((4,), jnp.float32)}
    # update far below bf16 resolution at 1.0 (eps ~ 0.0078)
    u = {"w": jnp.full((4096,), 1e-3, jnp.float32), "b": jnp.ones((4,), jnp.float32)}

    # deterministic apply loses it completely
    det = (p["w"].astype(jnp.float32) + u["w"]).astype(jnp.bfloat16)
    assert float(jnp.mean(det.astype(jnp.float32))) == 1.0

    new = apply_updates_stochastic(p, u, jax.random.PRNGKey(0))
    assert new["w"].dtype == jnp.bfloat16
    mean = float(jnp.mean(new["w"].astype(jnp.float32)))
    # E[rounded] ≈ 1.001: some elements must round up
    assert 1.0005 < mean < 1.002, mean
    np.testing.assert_allclose(np.asarray(new["b"]), 1.0)
