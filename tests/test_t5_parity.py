"""Golden parity: Flax T5 encoder vs HF torch T5EncoderModel (tiny config)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurosis_tpu.checkpoint import import_torch_params  # noqa: E402
from neurosis_tpu.models.text_encoder.t5 import T5EncoderModel, byt5_tokenize  # noqa: E402


def test_t5_encoder_parity():
    import torch
    from transformers import T5Config, T5EncoderModel as HFT5

    cfg = T5Config(
        vocab_size=100,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_heads=4,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    ref = HFT5(cfg)
    ref.eval()

    ids = np.array([[5, 9, 43, 1, 0, 0], [7, 1, 0, 0, 0, 0]], dtype=np.int32)
    with torch.no_grad():
        # no attention mask: our tower attends everywhere (reference passes
        # padded fixed-length batches the same way)
        ref_out = ref(input_ids=torch.from_numpy(ids.astype(np.int64)),
                      attention_mask=torch.ones_like(torch.from_numpy(ids.astype(np.int64)))).last_hidden_state.numpy()

    model = T5EncoderModel(vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4)
    tmpl = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(ids)))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    # HF stores the embedding twice (shared + encoder.embed_tokens)
    params, missing, unexpected = import_torch_params(tmpl["params"], sd)
    unexpected = [k for k in unexpected if "embed_tokens" not in k]
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]

    out = jax.jit(model.apply)({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=3e-5, rtol=1e-3)


def test_byt5_tokenize():
    ids = byt5_tokenize(["ab", "hello world"], max_length=8)
    assert ids.shape == (2, 8)
    assert ids[0, 0] == ord("a") + 3
    assert ids[0, 2] == 1  # eos
    assert ids[1, -1] == 1  # eos after truncation
