from soft_robot_control_tpu.estimators.ekf import EKFState, DiscreteEKFObserver, ekf_update  # noqa: F401
from soft_robot_control_tpu.estimators.full_state import FullStateObserver  # noqa: F401
from soft_robot_control_tpu.estimators.luenberger import DiscreteLuenbergerObserver  # noqa: F401
