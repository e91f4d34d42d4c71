"""Golden parity: our Flax text encoders vs transformers' torch models with
converted weights (random-init, eval mode). This validates both the
architectures and the torch->flax converters end to end."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pea_diffusion_tpu.checkpoints.torch_convert import (  # noqa: E402
    convert_bert_text,
    convert_clip_text,
    convert_t5_encoder,
    to_numpy_state_dict,
)
from pea_diffusion_tpu.configs.text_encoder import (  # noqa: E402
    BertTextConfig,
    CLIPTextConfig,
    T5Config,
)
from pea_diffusion_tpu.models.bert_text import BertTextEncoder  # noqa: E402
from pea_diffusion_tpu.models.clip_text import CLIPTextEncoder  # noqa: E402
from pea_diffusion_tpu.models.mt5 import T5Encoder  # noqa: E402

B, T = 2, 16
VOCAB = 500


def _ids(seed=0, high=VOCAB, pad=None, eos=None):
    rng = np.random.RandomState(seed)
    ids = rng.randint(4, high, size=(B, T)).astype(np.int64)
    if eos is not None:
        ids[:, 10] = eos
    if pad is not None:
        ids[:, 11:] = pad
    return ids


def test_clip_text_parity_quick_gelu():
    tcfg = transformers.CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=T, eos_token_id=VOCAB - 1,
        hidden_act="quick_gelu",
    )
    tm = transformers.CLIPTextModel(tcfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=64, num_layers=3, num_heads=4,
        intermediate_size=128, max_position_embeddings=T,
        eos_token_id=VOCAB - 1, hidden_act="quick_gelu",
    )
    m = CLIPTextEncoder(cfg)
    params = convert_clip_text(to_numpy_state_dict(tm), cfg.num_layers)

    ids = _ids(eos=VOCAB - 1)
    out = m.apply(params, jnp.asarray(ids))
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), output_hidden_states=True)
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state), ref.last_hidden_state.numpy(), atol=1e-5)
    # SDXL penultimate-state contract (train_sdxl_zh.py:245)
    np.testing.assert_allclose(
        np.asarray(out.penultimate_hidden_state), ref.hidden_states[-2].numpy(),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.pooled), ref.pooler_output.numpy(), atol=1e-5)


def test_clip_text_with_projection_parity_gelu():
    """bigG-style: gelu act + text projection."""
    tcfg = transformers.CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, projection_dim=48,
        max_position_embeddings=T, eos_token_id=VOCAB - 1, hidden_act="gelu",
    )
    tm = transformers.CLIPTextModelWithProjection(tcfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=T,
        eos_token_id=VOCAB - 1, hidden_act="gelu", projection_dim=48,
    )
    m = CLIPTextEncoder(cfg)
    params = convert_clip_text(to_numpy_state_dict(tm), cfg.num_layers)
    ids = _ids(1, eos=VOCAB - 1)
    out = m.apply(params, jnp.asarray(ids))
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids))
    np.testing.assert_allclose(
        np.asarray(out.projected), ref.text_embeds.numpy(), atol=1e-5)


def test_bert_parity_chinese_clip_style():
    tcfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, pad_token_id=0,
    )
    tm = transformers.BertModel(tcfg, add_pooling_layer=False).eval()
    cfg = BertTextConfig(
        vocab_size=VOCAB, hidden_size=64, num_layers=3, num_heads=4,
        intermediate_size=128, max_position_embeddings=64, pad_token_id=0,
    )
    m = BertTextEncoder(cfg)
    params = convert_bert_text(to_numpy_state_dict(tm), cfg.num_layers)
    ids = _ids(2, pad=0)
    mask = (ids != 0).astype(np.int64)
    out = m.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state), ref.last_hidden_state.numpy(),
        atol=2e-5)


def test_xlmr_parity_position_offsets():
    tcfg = transformers.XLMRobertaConfig(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, pad_token_id=1, type_vocab_size=1,
        layer_norm_eps=1e-5,
    )
    tm = transformers.XLMRobertaModel(tcfg, add_pooling_layer=False).eval()
    cfg = BertTextConfig(
        vocab_size=VOCAB, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=64, pad_token_id=1,
        type_vocab_size=1, layer_norm_eps=1e-5, roberta_position_ids=True,
    )
    m = BertTextEncoder(cfg)
    params = convert_bert_text(to_numpy_state_dict(tm), cfg.num_layers)
    ids = _ids(3, pad=1)
    mask = (ids != 1).astype(np.int64)
    out = m.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state), ref.last_hidden_state.numpy(),
        atol=2e-5)


def test_mt5_encoder_parity():
    tcfg = transformers.T5Config(
        vocab_size=VOCAB, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu", dropout_rate=0.0,
        relative_attention_num_buckets=32, relative_attention_max_distance=128,
    )
    tm = transformers.T5EncoderModel(tcfg).eval()
    cfg = T5Config(vocab_size=VOCAB, d_model=64, d_kv=16, d_ff=128,
                   num_layers=2, num_heads=4)
    m = T5Encoder(cfg)
    params = convert_t5_encoder(to_numpy_state_dict(tm), cfg.num_layers)
    ids = _ids(4, pad=0)
    mask = (ids != 0).astype(np.int64)
    out = m.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    np.testing.assert_allclose(
        np.asarray(out), ref.last_hidden_state.numpy(), atol=2e-5)
