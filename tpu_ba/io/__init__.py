from tpu_ba.io.synthetic import make_synthetic_problem  # noqa: F401
from tpu_ba.io.bal import load_bal, save_bal, make_bal_like_problem  # noqa: F401
