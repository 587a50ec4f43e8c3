from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.geometry import camera
from stereovision_slam_tpu.geometry import triangulation
from stereovision_slam_tpu.geometry import jacobians

__all__ = ["se3", "camera", "triangulation", "jacobians"]
