"""Inference library: fusion geometry, trajectory chaining, point clouds."""
import json

import jax.numpy as jnp
import numpy as np

from dro_sfm_tpu.inference import (
    TrajectoryAccumulator,
    check_geometric_consistency,
    filter_depth,
    geometric_fusion,
)
from dro_sfm_tpu.visualization.pointcloud import (
    depth_to_points,
    export_pointcloud,
)
from dro_sfm_tpu.visualization.trajectory import (
    absolute_trajectory_error,
    umeyama_alignment,
)


def make_K(h, w):
    return jnp.asarray([[w * 0.8, 0, (w - 1) / 2], [0, w * 0.8, (h - 1) / 2],
                        [0, 0, 1.0]], jnp.float32)


def test_consistency_identical_views():
    """Same depth, same pose -> everything consistent, depth preserved."""
    h, w = 16, 20
    depth = jnp.full((h, w), 4.0, jnp.float32)
    T = jnp.eye(4)
    mask, reproj = check_geometric_consistency(
        depth, depth, T, T, make_K(h, w))
    assert bool(mask.all())
    np.testing.assert_allclose(np.asarray(reproj), 4.0, atol=1e-4)


def test_consistency_translated_consistent_depth():
    """A fronto-parallel plane seen from two translated cameras is
    geometrically consistent where the views overlap."""
    h, w = 24, 32
    K = make_K(h, w)
    depth = jnp.full((h, w), 5.0, jnp.float32)
    T_ref = jnp.eye(4)
    T_src = jnp.eye(4).at[0, 3].set(0.2)  # camera shifted +x 20cm
    mask, _ = check_geometric_consistency(depth, depth, T_ref, T_src, K)
    # Overlapping interior must be consistent.
    assert float(mask[:, 8:-8].mean()) > 0.9


def test_consistency_rejects_wrong_depth():
    h, w = 16, 20
    K = make_K(h, w)
    depth_ref = jnp.full((h, w), 5.0, jnp.float32)
    depth_src = jnp.full((h, w), 2.0, jnp.float32)  # inconsistent
    T_ref = jnp.eye(4)
    T_src = jnp.eye(4).at[0, 3].set(0.2)
    mask, _ = check_geometric_consistency(depth_ref, depth_src, T_ref, T_src, K)
    assert float(mask.mean()) < 0.1


def test_geometric_fusion():
    h, w = 16, 20
    K = make_K(h, w)
    depth = jnp.full((h, w), 5.0, jnp.float32)
    srcs = jnp.stack([depth, depth, depth])
    T = jnp.eye(4)
    Ts = jnp.stack([T, T, T])
    fused = geometric_fusion(depth, srcs, T, Ts, K, thres_view=2)
    np.testing.assert_allclose(np.asarray(fused), 5.0, atol=1e-4)


def test_filter_depth():
    depth = np.full((20, 20), 3.0, dtype=np.float32)
    depth[10, 10] = 50.0  # far outlier + gradient spike
    out = filter_depth(depth, grad_max=0.05, depth_max=10.0,
                       crop_h=2, crop_w=2)
    assert out[10, 10] == 0.0
    assert out[0, 0] == 0.0  # border crop
    assert out[5, 5] == 3.0


def test_trajectory_accumulator_scale_chaining(tmp_path):
    accum = TrajectoryAccumulator()
    # Step 1: move +1 in z (relative to previous frame).
    p21 = np.eye(4)
    p21[:3, 3] = [0, 0, 1.0]
    p23 = np.eye(4)
    p23[:3, 3] = [0, 0, -2.0]  # next->cur seen at scale 2
    accum.add(p21, p23)
    # Step 2: pose21 with wrong scale (norm 1); chained scale should match
    # |t23_prev| = 2.
    q21 = np.eye(4)
    q21[:3, 3] = [0, 0, 1.0]
    q23 = np.eye(4)
    q23[:3, 3] = [0, 0, -1.0]
    g = accum.add(q21, q23)
    np.testing.assert_allclose(g[:3, 3], [0, 0, 3.0], atol=1e-6)

    path = tmp_path / "traj.json"
    accum.save_json(str(path))
    data = json.loads(path.read_text())
    assert len(data) == 2 and np.asarray(data[1]).shape == (4, 4)


def test_pointcloud_roundtrip(tmp_path):
    h, w = 8, 10
    K = np.asarray(make_K(h, w))
    depth = np.full((h, w), 2.0, dtype=np.float32)
    depth[0, 0] = 0.0  # invalid filtered out
    rgb = np.random.default_rng(0).uniform(size=(h, w, 3)).astype(np.float32)
    pts, colors = depth_to_points(depth, K, rgb=rgb)
    assert pts.shape == (h * w - 1, 3)
    assert colors.shape == (h * w - 1, 3)
    # center pixel should unproject near the optical axis at z=2
    n = export_pointcloud(str(tmp_path / "c.ply"), depth, K, rgb=rgb)
    assert n == h * w - 1
    text = (tmp_path / "c.ply").read_text()
    assert text.startswith("ply") and f"element vertex {n}" in text


def test_umeyama_and_ate():
    rng = np.random.default_rng(0)
    gt_pos = np.cumsum(rng.normal(size=(20, 3)), axis=0)
    # pred = scaled, rotated, shifted version of gt
    angle = 0.3
    R = np.array([[np.cos(angle), -np.sin(angle), 0],
                  [np.sin(angle), np.cos(angle), 0], [0, 0, 1]])
    pred_pos = (gt_pos @ R.T) * 0.5 + np.array([1.0, 2.0, 3.0])

    def to_poses(positions):
        out = []
        for p in positions:
            T = np.eye(4)
            T[:3, 3] = p
            out.append(T)
        return out

    ate = absolute_trajectory_error(to_poses(pred_pos), to_poses(gt_pos))
    assert ate < 1e-6  # perfectly recoverable by sim3 alignment

    s, R2, t = umeyama_alignment(pred_pos, gt_pos)
    np.testing.assert_allclose(s, 2.0, atol=1e-6)
