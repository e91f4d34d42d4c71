"""PEA adapter unit tests: shapes, param counts, and golden parity against a
torch re-implementation of the reference math (train_sdxl_zh.py:43-67)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.configs import ADAPTER_PRESETS, AdapterConfig
from pea_diffusion_tpu.models import PEAAdapter


def _init(cfg, B=2, T=7, seed=0):
    m = PEAAdapter(cfg)
    x = jax.random.normal(jax.random.PRNGKey(seed), (B, T, cfg.in_dim))
    params = m.init(jax.random.PRNGKey(1), x)
    return m, params, x


def test_sdxl_variant_shapes():
    cfg = ADAPTER_PRESETS["sdxl_chinese_clip"]
    m, params, x = _init(cfg)
    pooled, seq = m.apply(params, x)
    assert pooled.shape == (2, 1280)
    assert seq.shape == (2, 7, 2048)


def test_sd15_variant_shapes():
    cfg = ADAPTER_PRESETS["sd15_chinese_clip"]
    m, params, x = _init(cfg)
    seq = m.apply(params, x)
    assert seq.shape == (2, 7, 768)


@pytest.mark.parametrize(
    "name,expected_millions",
    [
        ("sdxl_plus", 11.54),  # SURVEY.md §2a param-count row
        ("sdxl_small", 5.0),
        ("sd15_chinese_clip", 7.87),
        ("sd15_deep", 33.8),
    ],
)
def test_param_counts_match_reference(name, expected_millions):
    cfg = ADAPTER_PRESETS[name]
    m, params, _ = _init(cfg, B=1, T=2)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n == cfg.param_count()
    assert abs(n / 1e6 - expected_millions) / expected_millions < 0.02


def test_residual_requires_matching_dims():
    cfg = AdapterConfig(64, (128, 64), head_dim=32, use_residual=True)
    m, params, x = _init(cfg, B=1, T=3)
    pooled, seq = m.apply(params, x)
    assert pooled.shape == (1, 64)
    assert seq.shape == (1, 3, 32)


def test_parity_with_torch_reference_math():
    """Rebuild the reference MLP_plus in torch, copy weights, compare outputs."""
    torch = pytest.importorskip("torch")

    cfg = AdapterConfig(16, (32, 32, 24), head_dim=20)
    m, params, x = _init(cfg, B=2, T=5)

    class TorchMLPPlus(torch.nn.Module):
        # independent re-implementation of the reference adapter equations
        def __init__(self):
            super().__init__()
            self.layernorm = torch.nn.LayerNorm(16)
            self.p0 = torch.nn.Linear(16, 32, bias=False)
            self.p1 = torch.nn.Linear(32, 32, bias=False)
            self.p2 = torch.nn.Linear(32, 24, bias=False)
            self.fc = torch.nn.Linear(24, 20)

        def forward(self, x):
            h = self.layernorm(x)
            h = self.p2(torch.nn.functional.gelu(
                self.p1(torch.nn.functional.gelu(self.p0(h)))))
            seq = self.fc(torch.nn.functional.gelu(h))
            return torch.mean(h, 1), seq

    t = TorchMLPPlus()
    p = params["params"]
    with torch.no_grad():
        t.layernorm.weight.copy_(torch.from_numpy(np.array(p["layernorm"]["scale"])))
        t.layernorm.bias.copy_(torch.from_numpy(np.array(p["layernorm"]["bias"])))
        for i, lin in enumerate([t.p0, t.p1, t.p2]):
            lin.weight.copy_(
                torch.from_numpy(np.array(p[f"projector_{i}"]["kernel"])).T)
        t.fc.weight.copy_(torch.from_numpy(np.array(p["fc"]["kernel"])).T)
        t.fc.bias.copy_(torch.from_numpy(np.array(p["fc"]["bias"])))

    pooled_j, seq_j = m.apply(params, x)
    with torch.no_grad():
        pooled_t, seq_t = t(torch.from_numpy(np.array(x)))
    np.testing.assert_allclose(pooled_j, pooled_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(seq_j, seq_t.numpy(), atol=2e-5)


def test_jit_and_grad():
    cfg = ADAPTER_PRESETS["sdxl_chinese_clip"]
    m, params, x = _init(cfg)

    @jax.jit
    def loss_fn(params, x):
        pooled, seq = m.apply(params, x)
        return jnp.mean(pooled**2) + jnp.mean(seq**2)

    g = jax.grad(loss_fn)(params, x)
    assert jax.tree.structure(g) == jax.tree.structure(params)
    assert all(jnp.all(jnp.isfinite(v)) for v in jax.tree.leaves(g))
