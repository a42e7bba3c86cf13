"""Parity of the fused Pallas SepConvGRU pass vs the flax conv reference.

The kernel (`dro_sfm_tpu/ops/pallas/gru_pass.py`) must match
`SepConvGRU(conv_impl="conv")` — same parameter tree, same math — in both
the forward values and every gradient (hidden state, input, conv kernels,
biases), since it replaces the conv path inside the training step.
All tests drive the REAL module wiring (`SepConvGRU._pallas_passes`) with
``pallas_interpret=True``, so the reshape/axis-order/cast plumbing the
checkpoint-compat claim rests on runs in CI on the CPU mesh; the TPU A/B
lives in `tools/perf_ablate.py` (`champ-it12-grupallas`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dro_sfm_tpu.models.update import SepConvGRU

B, H, W, D, CX = 2, 8, 16, 32, 24

# The production module with the Pallas path forced through the
# interpreter (on TPU this compiles the real kernel instead).
PALLAS_GRU = SepConvGRU(hidden_dim=D, conv_impl="pallas",
                        pallas_interpret=jax.default_backend() != "tpu")
CONV_GRU = SepConvGRU(hidden_dim=D)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(B, H, W, D)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, H, W, CX)), jnp.float32)
    params = CONV_GRU.init(jax.random.PRNGKey(1), h, x)
    return h, x, params


def test_forward_matches_conv_reference(inputs):
    h, x, params = inputs
    ref = CONV_GRU.apply(params, h, x)
    got = PALLAS_GRU.apply(params, h, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_conv_reference(inputs):
    h, x, params = inputs

    def loss_ref(params, h, x):
        out = CONV_GRU.apply(params, h, x)
        return jnp.sum(out * jnp.cos(out))   # non-trivial cotangent

    def loss_pallas(params, h, x):
        out = PALLAS_GRU.apply(params, h, x)
        return jnp.sum(out * jnp.cos(out))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, h, x)
    g_got = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, h, x)
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref)
    got_leaves = jax.tree_util.tree_leaves_with_path(g_got)
    assert len(ref_leaves) == len(got_leaves)
    for (path_r, leaf_r), (path_g, leaf_g) in zip(ref_leaves, got_leaves):
        assert path_r == path_g
        np.testing.assert_allclose(
            np.asarray(leaf_g), np.asarray(leaf_r), rtol=2e-4, atol=2e-4,
            err_msg=jax.tree_util.keystr(path_r))


def test_bf16_forward_close_to_fp32(inputs):
    """bf16 inputs run the bf16 MXU path with fp32 gate accumulators —
    the result must sit within bf16 rounding of the fp32 reference."""
    h, x, params = inputs
    ref = CONV_GRU.apply(params, h, x)
    bf16_gru = SepConvGRU(hidden_dim=D, conv_impl="pallas",
                          pallas_interpret=PALLAS_GRU.pallas_interpret,
                          dtype=jnp.bfloat16)
    got = bf16_gru.apply(params, h.astype(jnp.bfloat16),
                         x.astype(jnp.bfloat16))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.05)


def test_module_parameter_tree_identical(inputs):
    """conv_impl='pallas' must declare the exact same parameter tree as
    the conv path (checkpoint + converted-reference-weight compat) — with
    ``pallas_interpret`` forcing init through the REAL `_pallas_passes`
    branch (on CPU the un-forced module would rewrite impl to 'conv' and
    the comparison would be the conv path against itself)."""
    h, x, params = inputs
    p2 = PALLAS_GRU.init(jax.random.PRNGKey(1), h, x)
    ref_shapes = jax.tree_util.tree_map(jnp.shape, params)
    got_shapes = jax.tree_util.tree_map(jnp.shape, p2)
    assert ref_shapes == got_shapes


def test_vmem_guard_raises_clearly():
    """Maps whose per-element working set exceeds the kernel VMEM budget
    must fail with an explanatory error, not an opaque Mosaic crash."""
    big_h = jnp.zeros((1, 640, 480, 128), jnp.float32)
    big_x = jnp.zeros((1, 640, 480, 160), jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        PALLAS_GRU.init(jax.random.PRNGKey(0), big_h, big_x)


def test_split_impl_matches_conv_reference(inputs):
    """conv_impl='split' (concat-free h/x-sliced convs) is exact vs the
    conv path — identical parameter tree, same math by linearity."""
    h, x, params = inputs
    split_gru = SepConvGRU(hidden_dim=D, conv_impl="split")
    p2 = split_gru.init(jax.random.PRNGKey(1), h, x)
    assert (jax.tree_util.tree_map(jnp.shape, p2)
            == jax.tree_util.tree_map(jnp.shape, params))
    ref = CONV_GRU.apply(params, h, x)
    got = split_gru.apply(params, h, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn, params):
        return jnp.sum(fn.apply(params, h, x) ** 2)

    g_ref = jax.grad(lambda p: loss(CONV_GRU, p))(params)
    g_got = jax.grad(lambda p: loss(split_gru, p))(params)
    for (pr, lr), (pg, lg) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_got)):
        assert pr == pg
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lr),
                                   rtol=2e-4, atol=2e-4)
