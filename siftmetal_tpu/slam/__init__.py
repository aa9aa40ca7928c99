from .ba import BAProblem, BAStats, bundle_adjust
from .camera import project, rodrigues, so3_log
from .pnp import pnp_ransac
from .pose_graph import PoseGraph, optimize_pose_graph
from .sfm import SfmConfig, SfmMap
from .trajectory import ate_rmse, camera_centers, umeyama

__all__ = [
    "BAProblem", "BAStats", "bundle_adjust", "project", "rodrigues",
    "so3_log", "pnp_ransac", "PoseGraph", "optimize_pose_graph",
    "SfmConfig", "SfmMap", "ate_rmse", "camera_centers", "umeyama",
]
