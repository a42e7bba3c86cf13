"""Independent closed-form anchor for the exact FLOP ledger.

`tools/flops_exact.py` counts train-step model FLOPs from jaxpr
equations (convs + dot_generals, scan trip counts multiplied in). That
ledger underwrites the headline MFU figure, so it must not be a single
source of truth: these tests assert the jaxpr count matches a
closed-form analytic count — written straight from the architecture
definitions in `models/encoder.py` / `models/update.py`, with no shared
code — to within 1% (they should agree exactly; the slack covers only
future layout-motivated re-expressions such as conv->dot_general).
"""
import jax
import jax.numpy as jnp
import pytest

from tools.flops_exact import count_jaxpr


def _count(fn, *args):
    from collections import Counter
    agg = Counter()
    count_jaxpr(jax.make_jaxpr(fn)(*args).jaxpr, 1.0, agg)
    return sum(agg.values())


def conv_flops(b, h, w, cout, k, cin):
    """2 * output_elems * kernel_taps * input_channels."""
    return 2.0 * b * h * w * cout * k * cin


def test_encoder_ledger_matches_analytic():
    from dro_sfm_tpu.models.encoder import ResNetEncoder

    b, hi, wi, out_chs = 2, 64, 96, 128
    net = ResNetEncoder(out_chs=out_chs, stride=8)
    x = jnp.zeros((b, hi, wi, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    counted = _count(lambda v, y: net.apply(v, y, train=False), variables, x)

    # Closed form, layer by layer (encoder.py:85-121). Spatial sizes:
    # conv1 stride 2 -> H/2; maxpool -> H/4; layer2/3 stride 2 each.
    h2, w2 = hi // 2, wi // 2
    h4, w4 = hi // 4, wi // 4
    h8, w8 = hi // 8, wi // 8
    h16, w16 = hi // 16, wi // 16
    analytic = conv_flops(b, h2, w2, 64, 7 * 7, 3)          # conv1
    # layer1: 2 basic blocks, 64ch, stride 1, no downsample conv.
    analytic += 4 * conv_flops(b, h4, w4, 64, 9, 64)
    # layer2: block0 (stride 2: conv1 64->128, conv2 128->128, 1x1
    # downsample 64->128) + block1 (two 128->128).
    analytic += (conv_flops(b, h8, w8, 128, 9, 64)
                 + conv_flops(b, h8, w8, 128, 9, 128)
                 + conv_flops(b, h8, w8, 128, 1, 64)
                 + 2 * conv_flops(b, h8, w8, 128, 9, 128))
    # layer3: same pattern at stride 16, 128->256.
    analytic += (conv_flops(b, h16, w16, 256, 9, 128)
                 + conv_flops(b, h16, w16, 256, 9, 256)
                 + conv_flops(b, h16, w16, 256, 1, 128)
                 + 2 * conv_flops(b, h16, w16, 256, 9, 256))
    # upconv fusion at stride 8: 256->128, (128+128)->128, out 128->out.
    analytic += (conv_flops(b, h8, w8, 128, 9, 256)
                 + conv_flops(b, h8, w8, 128, 9, 256)
                 + conv_flops(b, h8, w8, out_chs, 9, 128))

    assert counted == pytest.approx(analytic, rel=0.01)


@pytest.mark.parametrize("conv_impl", ["conv", "split"])
def test_gru_ledger_matches_analytic(conv_impl):
    from dro_sfm_tpu.models.update import SepConvGRU

    b, h, w, d, cx = 2, 12, 16, 128, 160
    gru = SepConvGRU(hidden_dim=d, conv_impl=conv_impl)
    hid = jnp.zeros((b, h, w, d))
    x = jnp.zeros((b, h, w, cx))
    variables = gru.init(jax.random.PRNGKey(0), hid, x)
    counted = _count(lambda v, a, c: gru.apply(v, a, c), variables, hid, x)

    # Two directional passes ((1,5) then (5,1)), each: one fused zr conv
    # (2d outputs) + one q conv (d outputs), both over d+cx input
    # channels with 5 taps (update.py:166-174). The "split" impl slices
    # the same kernels into h/x parts — identical FLOPs by linearity.
    analytic = 2 * (conv_flops(b, h, w, 2 * d, 5, d + cx)
                    + conv_flops(b, h, w, d, 5, d + cx))

    assert counted == pytest.approx(analytic, rel=0.01)


@pytest.mark.slow  # re-tiered r5: >25s call (results/pytest_fast_r5_durations.log)
def test_train_step_ledger_scales_with_batch():
    """The full-step ledger must scale linearly in batch size — a cheap
    end-to-end sanity check that scan multipliers and the fwd+bwd trace
    are applied consistently (tools/flops_exact.py:71-102)."""
    from tools.flops_exact import step_flops

    f2 = sum(step_flops(b=2, n=2, h=96, w=128).values())
    f4 = sum(step_flops(b=4, n=2, h=96, w=128).values())
    assert f4 == pytest.approx(2.0 * f2, rel=0.02)
