from soft_robot_control_tpu.robots.robots import (DiamondRobot, TrunkRobot,  # noqa: F401
                                                  FingerRobot, SurrogateRobot)
