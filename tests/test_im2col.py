"""Conv1dMatmul (tap-stacked im2col matmul) must be a drop-in for nn.Conv
on single-axis kernels: same parameter tree, same forward values, same
gradients — so the `sep_conv: matmul` fast path shares checkpoints and
the converted reference weights with the lax-conv path
(`ops/im2col.py`; motivation in docs/perf_notes_r3.md)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dro_sfm_tpu.ops.im2col import Conv1dMatmul
from dro_sfm_tpu.models.update import SepConvGRU


def _ref_conv(features, kernel):
    return nn.Conv(features, kernel,
                   padding=tuple((k // 2, k // 2) for k in kernel),
                   kernel_init=nn.initializers.he_normal())


@pytest.mark.parametrize("kernel", [(1, 5), (5, 1), (1, 3), (3, 1)])
def test_matches_nn_conv(rng, kernel):
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 12)), jnp.float32)
    ref = _ref_conv(7, kernel)
    fast = Conv1dMatmul(features=7, kernel_size=kernel)
    variables = ref.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(
                fast.init(jax.random.PRNGKey(0), x)))
    np.testing.assert_allclose(ref.apply(variables, x),
                               fast.apply(variables, x),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match(rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 9, 8)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(2, 6, 9, 5)), jnp.float32)
    ref = _ref_conv(5, (1, 5))
    fast = Conv1dMatmul(features=5, kernel_size=(1, 5))
    variables = ref.init(jax.random.PRNGKey(0), x)

    def loss(mod, v, inp):
        return jnp.sum(mod.apply(v, inp) * cot)

    g_ref = jax.grad(lambda v, inp: loss(ref, v, inp), argnums=(0, 1))(
        variables, x)
    g_fast = jax.grad(lambda v, inp: loss(fast, v, inp), argnums=(0, 1))(
        variables, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fast)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_sep_conv_gru_impl_equivalence(rng):
    h = jnp.asarray(rng.normal(size=(2, 8, 10, 16)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 24)), jnp.float32)
    base = SepConvGRU(hidden_dim=16)
    fast = SepConvGRU(hidden_dim=16, conv_impl="matmul")
    variables = base.init(jax.random.PRNGKey(0), h, x)
    np.testing.assert_allclose(base.apply(variables, h, x),
                               fast.apply(variables, h, x),
                               rtol=1e-5, atol=1e-5)
