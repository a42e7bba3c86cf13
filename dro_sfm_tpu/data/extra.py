"""Remaining dataset registrations.

* `ScannetBA` / `MatterportBA` live in `dro_sfm_tpu.data.banet`: a real
  load-time parser of the reference's paired BA-Net split format.
* `ScannetTestMF` maps to the tuple reader (in the reference this name is a
  dead branch importing a nonexistent module, `model_wrapper.py:718-724`).
* `DGP` lives in `dro_sfm_tpu.data.dgp` — a self-contained parser of the
  public DGP JSON scene format (no external `dgp` package needed).
"""
from __future__ import annotations

from dro_sfm_tpu.data import register_dataset
from dro_sfm_tpu.data.scannet import ScannetTestDataset


def _tuple_factory(path, split, mode, image_shape, jittering, section):
    return ScannetTestDataset(
        root_dir=path, split=split, mode=mode,
        depth_type=(section.depth_type[0] if section.depth_type else None),
        back_context=section.back_context,
        forward_context=section.forward_context,
        image_shape=image_shape, jittering=())


register_dataset("ScannetTestMF")(_tuple_factory)


