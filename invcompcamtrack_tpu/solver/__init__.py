from invcompcamtrack_tpu.solver.icgn import track_pose, track_pose_batch  # noqa: F401
