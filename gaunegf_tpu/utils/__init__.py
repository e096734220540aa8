from gaunegf_tpu.utils.logging import get_logger, perf_span, profile_trace  # noqa: F401
