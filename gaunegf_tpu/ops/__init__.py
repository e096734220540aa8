from gaunegf_tpu.ops import zlinalg  # noqa: F401
