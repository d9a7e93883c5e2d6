from soft_robot_control_tpu.core import packing, types, discretize, constraints  # noqa: F401
