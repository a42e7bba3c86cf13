"""Bundle adjustment: Lie algebra, pose-graph optimization, distributed
dense BA with Schur-complement reduction."""
from dro_sfm_tpu.ba.dense_ba import (
    BAProblem,
    make_sharded_accumulate,
    optimize_dense_ba,
)
from dro_sfm_tpu.ba.lie import se3_exp, se3_log, so3_exp, so3_log
from dro_sfm_tpu.ba.pose_graph import optimize_pose_graph, total_edge_error
