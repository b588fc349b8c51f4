"""orbax full-state checkpoint save + resume roundtrip."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")



def test_checkpoint_save_and_resume(tmp_path):
    from test_engine_smoke import make_batch, make_tiny_engine

    from neurosis_tpu.trainer.callbacks import CheckpointCallback
    from neurosis_tpu.trainer.loop import Trainer

    engine = make_tiny_engine(use_ema=True)
    batch = make_batch()
    state, frozen = engine.init(jax.random.PRNGKey(0), batch)
    state, _ = jax.jit(engine.train_step)(state, frozen, batch)

    from neurosis_tpu.trainer.loop import HashTokenizer

    trainer = Trainer(engine, default_root_dir=str(tmp_path), tokenizer=HashTokenizer(max_length=8))
    cb = CheckpointCallback(every_n_train_steps=1)
    cb.on_train_batch_end(trainer, state, frozen, batch, {}, int(state.step))
    cb.on_fit_end(trainer, state)

    # fresh state → resume restores step, params, opt_state, ema
    fresh, _ = engine.init(jax.random.PRNGKey(1), batch)
    resumed = trainer._maybe_resume(fresh)
    assert int(resumed.step) == int(state.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(resumed.params), jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(resumed.ema.params), jax.tree_util.tree_leaves(state.ema.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(resumed.ema.num_updates) == int(state.ema.num_updates)
