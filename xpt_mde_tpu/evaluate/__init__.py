from xpt_mde_tpu.evaluate.depth_metrics import (
    valid_depth_filter,
    compute_depth_metrics,
    DEPTH_METRIC_NAMES,
)
from xpt_mde_tpu.evaluate.pose_metrics import PoseMetric
