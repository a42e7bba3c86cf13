"""Pallas TPU kernels for the hot ops."""
from dro_sfm_tpu.ops.pallas.tent_warp import (pallas_warp_cost, tent_warp,
                                              tent_warp_diff)
