"""Tokenizer BPE behavior, hook loss scaling, tools, torch export roundtrip."""

import numpy as np
import pytest

from neurosis_tpu.hooks import TagFreqScale, TagFrequencyHook, TagRewards
from neurosis_tpu.models.text_encoder.tokenizer import make_test_tokenizer
from neurosis_tpu.tools.blessup import bless


def test_tokenizer_basic_roundtrip():
    tok = make_test_tokenizer(words=["hello", "world"], max_length=16)
    ids = tok(["hello world", "hello"])
    assert ids.shape == (2, 16)
    assert ids[0, 0] == tok.bos_token_id
    # merged whole words take single tokens
    assert tok.decode(list(ids[0])) == "hello world"
    # eos padding
    assert ids[1, -1] == tok.pad_token_id


def test_tokenizer_extended_chunks():
    tok = make_test_tokenizer(words=["tag"], max_length=8)
    ids = tok.tokenize_extended(["tag " * 30], chunks=3)
    assert ids.shape == (1, 3, 8)
    assert (ids[0, :, 0] == tok.bos_token_id).all()
    assert (ids[0, :, -1] == tok.eos_token_id).all()


def test_tag_freq_scale_table():
    scale = TagFreqScale([[-1, 1.1], [10, 1.05], [100, 1.0], [1000, 0.9]])
    assert scale(0) == 1.1
    assert scale(10) == 1.05
    assert scale(99) == 1.05
    assert scale(100) == 1.0
    assert scale(5000) == 0.9


def test_tag_frequency_hook_injects_loss_scale():
    hook = TagFrequencyHook(
        input_key="caption",
        tag_sep=", ",
        check_fn=None,
        alpha=1.0,  # pure per-sample for determinism
        beta=0.99,
        strength=1.0,
        freq_scale=TagFreqScale([[-1, 1.2], [2, 0.8]]),
        tag_rewards=TagRewards(masterpiece=1.5),
    )
    batch = {"caption": ["cat, dog", "masterpiece, cat"]}
    out = hook.pre_hook(None, None, batch, 0)
    assert "loss_scale" in out
    assert out["loss_scale"].shape == (2,)
    # unseen tags → boost >1 for first sample
    assert out["loss_scale"][0] > 1.0
    # counts updated after scoring
    assert hook.counts["cat"] == 2

    # after 3 more batches, 'cat' count >= 2 → damped
    for i in range(3):
        out = hook.pre_hook(None, None, {"caption": ["cat"]}, i + 1)
    assert hook.counts["cat"] >= 2
    assert out["loss_scale"][0] < 1.2

    loss, log = hook.batch_hook(None, out, 1.0, {})
    assert "train/tag_vocab_size" in log


def test_blessup_adjusts_keys():
    state = {
        "decoder.conv_out.weight": np.ones((3, 3, 1, 1), np.float32),
        "decoder.conv_out.bias": np.zeros((3,), np.float32),
    }
    out = bless(state, contrast=2.0, brightness=0.5)
    assert np.allclose(out["decoder.conv_out.weight"], 2.0)
    assert np.allclose(out["decoder.conv_out.bias"], 0.5)


def test_torch_export_roundtrip():
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from neurosis_tpu.checkpoint import import_torch_params
    from neurosis_tpu.checkpoint.torch_export import export_torch_state
    from neurosis_tpu.models.vae import Encoder

    enc = Encoder(ch=32, ch_mult=[1], num_res_blocks=1, attn_resolutions=[], resolution=8, z_channels=2)
    x = jnp.zeros((1, 8, 8, 3))
    params = jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), x))["params"]
    params = jax.tree_util.tree_map(
        lambda s: np.random.RandomState(0).randn(*s.shape).astype(np.float32), params
    )

    sd = export_torch_state(params, prefix="encoder.")
    assert any(k.startswith("encoder.conv_in.weight") for k in sd)
    back, missing, unexpected = import_torch_params(params, sd, prefix="encoder.")
    assert not missing and not unexpected
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        np.testing.assert_array_equal(a, b)


def test_sd15_ldm_remap():
    from neurosis_tpu.tools.convert import extract_vae, remap_sd15_ldm

    state = {
        "cond_stage_model.transformer.x": np.zeros(1),
        "model.diffusion_model.y": np.zeros(1),
        "first_stage_model.encoder.z": np.zeros(1),
    }
    out = remap_sd15_ldm(state)
    assert "conditioner.embedders.0.transformer.x" in out
    vae = extract_vae(state)
    assert list(vae) == ["encoder.z"]


def test_vae_to_diffusers_export(tmp_path):
    """vae2hf: sgm-layout VAE -> HF-diffusers dir (vae-neurosis2ldm.py -D):
    key remap (resnets/attentions/mid_block, up-block reversal, 1x1-conv qkv
    squeeze), config.json emission, tensor roundtrip."""
    import jax
    import numpy as np

    from neurosis_tpu.checkpoint.torch_export import export_torch_state
    from neurosis_tpu.models.autoencoder import AutoencoderKL
    from neurosis_tpu.tools.convert import main as convert_main, sgm_vae_to_diffusers

    dd = dict(double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
              ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0)
    vae = AutoencoderKL(ddconfig=dd, embed_dim=4)
    x = np.zeros((1, 32, 32, 3), np.float32)
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    sgm_sd = export_torch_state(params)

    hf = sgm_vae_to_diffusers(sgm_sd, num_levels=2)
    keys = set(hf)
    # resnet + downsampler/upsampler renames
    assert any(k.startswith("encoder.down_blocks.0.resnets.0.") for k in keys)
    assert any(k.startswith("decoder.up_blocks.") for k in keys)
    assert "encoder.conv_norm_out.weight" in keys
    # up-block order reversed: sgm decoder.up.1 (highest res) -> up_blocks.0
    assert any(k.startswith("decoder.up_blocks.0.") for k in keys)
    # mid attention: 1x1 convs became linear to_q/k/v
    qk = [k for k in keys if "mid_block.attentions.0.to_q.weight" in k]
    for k in qk:
        assert hf[k].ndim == 2
    # quant convs pass through
    assert "quant_conv.weight" in keys and "post_quant_conv.weight" in keys
    # no sgm-style names survive
    assert not any(".nin_shortcut." in k or ".mid.attn_1." in k or k.startswith("encoder.down.") for k in keys)

    # CLI end-to-end from a safetensors file
    from safetensors.numpy import save_file

    src = tmp_path / "vae.safetensors"
    save_file({k: np.ascontiguousarray(v) for k, v in sgm_sd.items()}, str(src))
    out_dir = tmp_path / "hf"
    rc = convert_main(["vae2hf", str(src), str(out_dir), "-C", "sdxl"])
    assert rc == 0
    import json

    cfg = json.loads((out_dir / "config.json").read_text())
    assert cfg["_class_name"] == "AutoencoderKL" and cfg["scaling_factor"] == 0.13025
    from safetensors.numpy import load_file

    written = load_file(str(out_dir / "diffusion_pytorch_model.safetensors"))
    np.testing.assert_array_equal(written["quant_conv.weight"], np.asarray(sgm_sd["quant_conv.weight"]))
