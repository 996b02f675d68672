from tpu_ba.utils.cache import enable_compilation_cache  # noqa: F401
