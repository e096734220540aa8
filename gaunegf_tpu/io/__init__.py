from gaunegf_tpu.io import checkpoint  # noqa: F401
