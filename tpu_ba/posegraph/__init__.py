from tpu_ba.posegraph.solver import solve_pose_graph, pose_graph_cost  # noqa: F401
