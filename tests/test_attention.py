import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapf_gpt_tpu.ops.attention import attention_einsum, attention_pallas


@pytest.mark.parametrize("shape", [(4, 5, 256, 32), (2, 8, 256, 32),
                                   (3, 12, 256, 64)])
def test_pallas_matches_einsum_interpret(shape):
    """Kernel parity in interpret mode (CPU)."""
    b, h, t, d = shape
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, t, d), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(b, h, t, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, d), dtype=jnp.float32)
    scale = 1.0 / np.sqrt(d)
    ref = attention_einsum(q, k, v, scale)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = attention_pallas(q, k, v, scale, group=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_pad_group_remainder():
    b, h, t, d = 1, 3, 256, 32   # bh=3 not divisible by group=8
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, h, t, d), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(b, h, t, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, d), dtype=jnp.float32)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = attention_pallas(q, k, v, 0.2, group=8)
    ref = attention_einsum(q, k, v, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_model_auto_impl_on_cpu_uses_einsum():
    from mapf_gpt_tpu.models.gpt import GPT, GPTConfig, init_params

    cfg = GPTConfig(n_layer=1, n_head=2, n_embd=32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    idx = jnp.zeros((2, 256), dtype=jnp.int32)
    out = GPT(cfg).apply(params, idx)   # must not crash on CPU
    assert out.shape == (2, 67)
