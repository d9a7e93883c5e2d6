from soft_robot_control_tpu.qp.admm import QPSolution, solve_qp_dense  # noqa: F401
