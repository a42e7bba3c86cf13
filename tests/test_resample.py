"""Bilinear sampling / resize parity against torch (CPU oracle)."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from dro_sfm_tpu.ops import (  # noqa: E402
    avg_pool_3x3_reflect,
    bilinear_sample,
    convex_upsample,
    resize_bilinear,
    resize_nearest,
    ssim_loss,
)


def test_bilinear_sample_matches_grid_sample(rng):
    b, h, w, c = 2, 9, 13, 4
    img = rng.normal(size=(b, h, w, c)).astype(np.float32)
    # coords spanning inside and outside the image
    coords = rng.uniform(-1.5, 1.5, size=(b, h, w, 2)).astype(np.float32)

    ours = bilinear_sample(jnp.asarray(img), jnp.asarray(coords), normalized=True)

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_coords = torch.from_numpy(coords)
    theirs = F.grid_sample(t_img, t_coords, mode="bilinear",
                           padding_mode="zeros", align_corners=True)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_bilinear_sample_identity_grid(rng):
    b, h, w, c = 1, 6, 7, 2
    img = rng.normal(size=(b, h, w, c)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([xs, ys], axis=-1).astype(np.float32)[None]
    out = bilinear_sample(jnp.asarray(img), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("shape", [(12, 20), (5, 9)])
def test_resize_bilinear_matches_torch(align, shape, rng):
    b, h, w, c = 2, 10, 16, 3
    img = rng.normal(size=(b, h, w, c)).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(img), shape, align_corners=align)
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    theirs = F.interpolate(t_img, size=shape, mode="bilinear", align_corners=align)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_resize_nearest_matches_torch(rng):
    b, h, w, c = 2, 10, 16, 1
    img = rng.normal(size=(b, h, w, c)).astype(np.float32)
    for shape in [(5, 8), (20, 32), (7, 11)]:
        ours = resize_nearest(jnp.asarray(img), shape)
        t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
        theirs = F.interpolate(t_img, size=shape, mode="nearest")
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=0)


def test_avg_pool_reflect_matches_torch(rng):
    b, h, w, c = 1, 8, 8, 3
    img = rng.normal(size=(b, h, w, c)).astype(np.float32)
    ours = avg_pool_3x3_reflect(jnp.asarray(img))
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    theirs = torch.nn.AvgPool2d(3, stride=1)(torch.nn.ReflectionPad2d(1)(t))
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_ssim_loss_matches_reference_formula(rng):
    """Oracle: re-derive the reference SSIM in torch and compare."""
    b, h, w, c = 1, 12, 12, 3
    x = rng.uniform(size=(b, h, w, c)).astype(np.float32)
    y = rng.uniform(size=(b, h, w, c)).astype(np.float32)
    ours = ssim_loss(jnp.asarray(x), jnp.asarray(y))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    ty = torch.from_numpy(y).permute(0, 3, 1, 2)
    pool = torch.nn.AvgPool2d(3, stride=1)
    refl = torch.nn.ReflectionPad2d(1)
    tx, ty = refl(tx), refl(ty)
    mu_x, mu_y = pool(tx), pool(ty)
    sigma_x = pool(tx ** 2) - mu_x ** 2
    sigma_y = pool(ty ** 2) - mu_y ** 2
    sigma_xy = pool(tx * ty) - mu_x * mu_y
    C1, C2 = 1e-4, 9e-4
    v1 = 2 * sigma_xy + C2
    v2 = sigma_x + sigma_y + C2
    ssim_t = ((2 * mu_x * mu_y + C1) * v1) / ((mu_x ** 2 + mu_y ** 2 + C1) * v2)
    expected = torch.clamp((1 - ssim_t) / 2, 0, 1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_convex_upsample_matches_torch_unfold(rng):
    """Oracle: the reference's unfold-based implementation re-done in torch."""
    b, h, w, r = 2, 4, 6, 8
    depth = rng.normal(size=(b, h, w, 1)).astype(np.float32)
    mask = rng.normal(size=(b, h, w, 9 * r * r)).astype(np.float32)

    ours = convex_upsample(jnp.asarray(depth), jnp.asarray(mask), ratio=r)

    t_depth = torch.from_numpy(depth).permute(0, 3, 1, 2)
    # reference layout: (N, 1, 9, r, r, H, W) from a channel-first mask
    t_mask = torch.from_numpy(mask).permute(0, 3, 1, 2).view(b, 1, 9, r, r, h, w)
    t_mask = torch.softmax(t_mask, dim=2)
    up = F.unfold(t_depth, [3, 3], padding=1).view(b, 1, 9, 1, 1, h, w)
    up = torch.sum(t_mask * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3).reshape(b, 1, r * h, r * w)
    expected = up.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)
