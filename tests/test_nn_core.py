"""nn core vs torch ground truth (torch is available CPU-only): forward
semantics of Linear/MLP/LayerNorm match, and initializer distributions match
torch defaults — the basis for checkpoint-import numerical parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ultra_torchdrug_tpu.nn.core import (
    count_params,
    embedding_init,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
)


def test_linear_matches_torch(rng):
    p = linear_init(jax.random.PRNGKey(0), 12, 7)
    x = rng.normal(size=(5, 12)).astype(np.float32)
    got = np.asarray(linear_apply(p, jnp.asarray(x)))
    lin = torch.nn.Linear(12, 7)
    with torch.no_grad():
        lin.weight.copy_(torch.tensor(np.asarray(p["w"]).T))
        lin.bias.copy_(torch.tensor(np.asarray(p["b"])))
        want = lin(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_layer_norm_matches_torch(rng):
    p = layer_norm_init(16)
    scale = rng.normal(size=16).astype(np.float32)
    bias = rng.normal(size=16).astype(np.float32)
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    x = rng.normal(size=(4, 16)).astype(np.float32) * 3
    got = np.asarray(layer_norm_apply(p, jnp.asarray(x)))
    ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.copy_(torch.tensor(scale))
        ln.bias.copy_(torch.tensor(bias))
        want = ln(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mlp_matches_torch_relu_placement(rng):
    """torchdrug MLP: ReLU after every layer except the last."""
    p = mlp_init(jax.random.PRNGKey(1), 8, [6, 4])
    x = rng.normal(size=(3, 8)).astype(np.float32)
    got = np.asarray(mlp_apply(p, jnp.asarray(x)))
    h = torch.tensor(x)
    for i, lp in enumerate(p["layers"]):
        lin = torch.nn.Linear(*np.asarray(lp["w"]).shape)
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(np.asarray(lp["w"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(lp["b"])))
            h = lin(h)
            if i < len(p["layers"]) - 1:
                h = torch.relu(h)
    np.testing.assert_allclose(got, h.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_linear_init_matches_torch_distribution():
    """torch Linear default: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = 64
    p = linear_init(jax.random.PRNGKey(2), fan_in, 256)
    w = np.asarray(p["w"])
    bound = 1.0 / np.sqrt(fan_in)
    assert w.min() >= -bound and w.max() <= bound
    assert w.max() > 0.9 * bound and w.min() < -0.9 * bound  # fills the range
    assert abs(w.mean()) < 0.01


def test_embedding_init_normal():
    p = embedding_init(jax.random.PRNGKey(3), 1000, 64)
    w = np.asarray(p["weight"])
    assert abs(w.mean()) < 0.02 and abs(w.std() - 1.0) < 0.02


def test_count_params_flagship():
    """The flagship architecture lands at the reference's ~168k parameters
    (README.md:57) for FB15k237-like R=237."""
    from ultra_torchdrug_tpu.models.ultra import UltraConfig, ultra_init

    cfg = UltraConfig.default(num_relations=237)
    params = ultra_init(jax.random.PRNGKey(0), cfg)
    n = count_params(params)
    # reference counts include the dead dist_embed (640) and rel-tower mlp
    # (~41k total dead weights); the live-parameter count must match the
    # 6x(16704) + 16641 + 6x8640 structure
    assert n == 6 * 16704 + 16641 + 6 * 8640, n
