"""CLIP vision tower parity vs transformers (converted weights) + CLIP-score
math."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pea_diffusion_tpu.checkpoints.torch_convert import (  # noqa: E402
    convert_clip_vision,
    to_numpy_state_dict,
)
from pea_diffusion_tpu.cli.evaluate import clip_score  # noqa: E402
from pea_diffusion_tpu.models.clip_vision import (  # noqa: E402
    CLIPVisionConfig,
    CLIPVisionEncoder,
)


def test_clip_vision_parity():
    tcfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, projection_dim=48,
        hidden_act="quick_gelu",
    )
    tm = transformers.CLIPVisionModelWithProjection(tcfg).eval()
    cfg = CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=64,
                           num_layers=2, num_heads=4, intermediate_size=128,
                           projection_dim=48)
    m = CLIPVisionEncoder(cfg)
    params = convert_clip_vision(to_numpy_state_dict(tm), cfg.num_layers)

    rng = np.random.RandomState(0)
    pix = rng.randn(2, 32, 32, 3).astype(np.float32)
    out = m.apply(params, jnp.asarray(pix))
    with torch.no_grad():
        ref = tm(torch.from_numpy(pix.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out.projected),
                               ref.image_embeds.numpy(), atol=2e-5)


def test_clip_score_math():
    t = jnp.asarray([[1.0, 0.0], [0.0, 2.0], [1.0, 0.0]])
    v = jnp.asarray([[2.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
    s = np.asarray(clip_score(t, v))
    np.testing.assert_allclose(s, [1.0, 1.0, 0.0], atol=1e-6)  # clipped at 0
