"""Loader sharding/padding, config system, collectives."""
import numpy as np
import pytest

from dro_sfm_tpu.data import DataLoader, RepeatedDataset, SyntheticConfig, SyntheticDataset
from dro_sfm_tpu.utils.config import ConfigNode, get_default_config, load_config


class TinyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": i, "filename": str(i),
                "rgb": np.full((4, 4, 3), i, np.float32),
                "rgb_context": np.zeros((1, 4, 4, 3), np.float32),
                "intrinsics": np.eye(3, dtype=np.float32)}


def test_loader_host_sharding_disjoint():
    """Two shards cover the dataset disjointly and equally."""
    ds = TinyDataset(16)
    seen = []
    for shard in (0, 1):
        loader = DataLoader(ds, batch_size=2, shuffle=True, num_shards=2,
                            shard_id=shard, seed=7)
        idxs = []
        for batch in loader:
            idxs.extend(batch["idx"].tolist())
        assert len(idxs) == 8
        seen.append(set(idxs))
    assert seen[0] | seen[1] == set(range(16))
    assert not (seen[0] & seen[1])


def test_loader_epoch_reshuffle():
    ds = TinyDataset(16)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=3)
    loader.set_epoch(0)
    order0 = [i for b in loader for i in b["idx"].tolist()]
    loader.set_epoch(1)
    order1 = [i for b in loader for i in b["idx"].tolist()]
    assert order0 != order1
    assert sorted(order0) == sorted(order1) == list(range(16))


def test_loader_tail_padding_valid_mask():
    ds = TinyDataset(5)
    loader = DataLoader(ds, batch_size=4, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["valid"].all()
    assert batches[1]["valid"].tolist() == [True, False, False, False]


def test_repeated_dataset():
    ds = RepeatedDataset(TinyDataset(3), repeat=4)
    assert len(ds) == 12
    assert ds[7]["idx"] == 1


def test_config_unknown_key_rejected():
    cfg = get_default_config()
    with pytest.raises(KeyError):
        cfg.merge_dict({"model": {"nonexistent_key": 1}})


def test_config_type_mismatch_rejected():
    cfg = get_default_config()
    with pytest.raises(TypeError):
        cfg.merge_dict({"arch": {"max_epochs": "fifty"}})


def test_config_dataset_broadcasting():
    cfg = load_config(overrides={"datasets": {"validation": {
        "dataset": ["KITTI", "KITTI"],
        "path": ["/a"],
        "split": ["s1.txt", "s2.txt"],
        "depth_type": ["velodyne"]}}})
    v = cfg.datasets.validation
    assert v.path == ["/a", "/a"]
    assert v.depth_type == ["velodyne", "velodyne"]
    assert v.split == ["s1.txt", "s2.txt"]


def test_collectives_single_host():
    from dro_sfm_tpu.parallel.collectives import (
        all_reduce_metric_sums,
        average_loss_and_metrics,
        reduce_dict,
    )
    d = reduce_dict({"a": 1.0, "b": 2.0})
    assert d == {"a": 1.0, "b": 2.0}
    sums, count = all_reduce_metric_sums(np.array([3.0, 6.0]), 3,
                                         expected_total=3)
    assert count == 3
    with pytest.raises(AssertionError):
        all_reduce_metric_sums(np.array([1.0]), 2, expected_total=3)
    avg = average_loss_and_metrics([{"loss": 1.0}, {"loss": 3.0}])
    assert avg == {"avg-loss": 2.0}


def test_synthetic_multiview_consistency():
    """Rendered context frames photometrically match warping the target
    (exactness of the analytic renderer)."""
    import jax.numpy as jnp
    from dro_sfm_tpu.geometry.camera import Camera, Pose
    from dro_sfm_tpu.ops.resample import bilinear_sample

    ds = SyntheticDataset(SyntheticConfig(num_scenes=1, height=48, width=64,
                                          num_context=1), mode="validation")
    s = ds[0]
    depth = jnp.asarray(s["depth"])[None]
    K = jnp.asarray(s["intrinsics"])[None]
    cam = Camera(K)
    pts = cam.reconstruct(depth, frame="w")
    ref_cam = Camera(K, Pose(jnp.asarray(s["pose_context"][0])[None]))
    coords = ref_cam.project(pts, frame="w", normalize=False)
    warped = bilinear_sample(jnp.asarray(s["rgb_context"][0])[None], coords)
    inside = ((coords[..., 0] > 1) & (coords[..., 0] < 62)
              & (coords[..., 1] > 1) & (coords[..., 1] < 46))
    err = np.abs(np.asarray(warped - jnp.asarray(s["rgb"])[None]))
    err = err[np.asarray(inside)]
    assert err.mean() < 0.02, err.mean()


def test_memory_policy_auto_resolution():
    """"auto" perf knobs resolve per operating point: no-remat fast path
    below the batch-pixels threshold (raised to 2.5M in r5 — the 320x960
    b8 reference point now fits and runs 19% faster without remat,
    results/remat320_ab_r5.jsonl), remat above it; explicit values
    (including the "save_named" policy string) pass through untouched."""
    from dro_sfm_tpu.models.sfm import resolve_memory_policy

    assert resolve_memory_policy("auto", "auto", 8, (192, 640)) == (
        False, "full")
    assert resolve_memory_policy("auto", "auto", 8, (320, 960)) == (
        False, "full")
    assert resolve_memory_policy("auto", "auto", 16, (320, 960)) == (
        True, "full")
    # explicit pins win
    assert resolve_memory_policy(True, "none", 1, (96, 128)) == (True, "none")
    assert resolve_memory_policy("save_named", "none", 8, (320, 960)) == (
        "save_named", "none")
    assert resolve_memory_policy(False, "inner", 8, (320, 960)) == (
        False, "inner")


def test_memory_policy_through_config():
    """The yaml pipeline: default "auto" resolves via the train operating
    point; explicit bools in yaml still override."""
    from dro_sfm_tpu.training.trainer import model_config_from
    from dro_sfm_tpu.utils.config import load_config

    cfg = load_config("configs/train_kitti_mf_gt.yaml")   # 320x960 b2
    mc = model_config_from(cfg)
    assert (mc.remat, mc.scan_unroll) == (False, "full")
    cfg.datasets.train.batch_size = 16                    # above threshold
    mc = model_config_from(cfg)
    assert (mc.remat, mc.scan_unroll) == (True, "full")
    cfg2 = load_config("configs/train_synthetic_fp32.yaml")  # pinned knobs
    mc2 = model_config_from(cfg2)
    assert (mc2.remat, mc2.scan_unroll) == (True, "none")


def test_device_prefetch_order_and_lookahead():
    """device_prefetch yields every batch in order, places each exactly
    once, and keeps `depth` placements in flight ahead of the consumer."""
    from dro_sfm_tpu.data.loader import device_prefetch

    placed = []
    batches = [{"i": i} for i in range(5)]
    out = []
    gen = device_prefetch(batches, lambda b: placed.append(b["i"]) or b["i"],
                          depth=2)
    first = next(gen)
    # Two placements dispatched before the first batch is consumed.
    assert placed == [0, 1] and first == ({"i": 0}, 0)
    out = [first] + list(gen)
    assert [b["i"] for b, _ in out] == list(range(5))
    assert [p for _, p in out] == placed == list(range(5))
