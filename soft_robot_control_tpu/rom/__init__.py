from soft_robot_control_tpu.rom.pod import POD, pod_config, compute_POD, run_POD, load_POD  # noqa: F401
