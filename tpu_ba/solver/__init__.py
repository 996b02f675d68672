from tpu_ba.solver.lm import solve  # noqa: F401
