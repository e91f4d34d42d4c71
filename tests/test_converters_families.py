"""Real-layout converter goldens for the two encoder families VERDICT r1
flagged as unloadable: open_clip's XLM-R tower (`text.transformer.*` layout,
reference train_sdxl_zh.py:98-100) and AltCLIP (`roberta.*` + pre_LN +
transformation, :115-124). Each test builds a torch model in the REAL
checkpoint layout, converts, and asserts numerics."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pea_diffusion_tpu.checkpoints.torch_convert import (  # noqa: E402
    convert_altclip_text,
    convert_open_clip_xlmr,
    to_numpy_state_dict,
)
from pea_diffusion_tpu.configs.text_encoder import BertTextConfig  # noqa: E402
from pea_diffusion_tpu.models.bert_text import BertTextEncoder  # noqa: E402

B, T, VOCAB = 2, 16, 500


def _ids(seed, pad):
    rng = np.random.RandomState(seed)
    ids = rng.randint(4, VOCAB, size=(B, T)).astype(np.int64)
    ids[:, 12:] = pad
    return ids


def test_open_clip_xlmr_layout_conversion():
    """Synthetic open_clip_pytorch_model.bin layout: HF XLM-R model keys
    under text.transformer.*, plus visual/proj keys that must be ignored."""
    tcfg = transformers.XLMRobertaConfig(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=T + 2, pad_token_id=1, type_vocab_size=1,
        layer_norm_eps=1e-5,
    )
    tm = transformers.XLMRobertaModel(tcfg, add_pooling_layer=False).eval()
    hf_sd = to_numpy_state_dict(tm)
    open_clip_sd = {f"text.transformer.{k}": v for k, v in hf_sd.items()}
    # distractors present in real open_clip checkpoints
    open_clip_sd["visual.trunk.blocks.0.attn.qkv.weight"] = np.zeros((3, 3))
    open_clip_sd["text.proj.weight"] = np.zeros((64, 64))
    open_clip_sd["logit_scale"] = np.zeros(())

    cfg = BertTextConfig(
        vocab_size=VOCAB, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=T + 2, pad_token_id=1,
        type_vocab_size=1, layer_norm_eps=1e-5, roberta_position_ids=True,
    )
    params = convert_open_clip_xlmr(open_clip_sd, cfg.num_layers)
    m = BertTextEncoder(cfg)
    ids = _ids(0, pad=1)
    mask = (ids != 1).astype(np.int64)
    out = m.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    np.testing.assert_allclose(np.asarray(out.last_hidden_state),
                               ref.last_hidden_state.numpy(), atol=2e-5)


def test_open_clip_converter_rejects_wrong_layout():
    with pytest.raises(ValueError, match="open_clip"):
        convert_open_clip_xlmr({"roberta.embeddings.x": np.zeros(1)}, 2)


def test_altclip_text_parity():
    """transformers AltCLIPTextModel golden: its last_hidden_state IS the
    projected 768-d (here 48-d) token sequence = transformation(pre_LN(h))."""
    tcfg = transformers.AltCLIPTextConfig(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=T + 2, pad_token_id=1, type_vocab_size=1,
        layer_norm_eps=1e-5, project_dim=48,
    )
    tm = transformers.AltCLIPTextModel(tcfg).eval()
    sd = to_numpy_state_dict(tm)
    cfg = BertTextConfig(
        vocab_size=VOCAB, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=T + 2, pad_token_id=1,
        type_vocab_size=1, layer_norm_eps=1e-5, roberta_position_ids=True,
        project_dim=48,
    )
    params = convert_altclip_text(sd, cfg.num_layers)
    m = BertTextEncoder(cfg)
    ids = _ids(1, pad=1)
    mask = (ids != 1).astype(np.int64)
    out = m.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    assert out.projected.shape == (B, T, 48)
    np.testing.assert_allclose(np.asarray(out.projected),
                               ref.last_hidden_state.numpy(), atol=2e-5)


def test_altclip_converter_rejects_wrong_layout():
    with pytest.raises(ValueError, match="AltCLIP"):
        convert_altclip_text({"encoder.layer.0.x": np.zeros(1)}, 2)
