from soft_robot_control_tpu.scp.locp import LOCP, LOCPSpec  # noqa: F401
from soft_robot_control_tpu.scp.gusto import GuSTO, GuSTOParams  # noqa: F401
