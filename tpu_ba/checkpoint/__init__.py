from tpu_ba.checkpoint.state import save_checkpoint, load_checkpoint  # noqa: F401
