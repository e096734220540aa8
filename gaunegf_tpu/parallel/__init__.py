from gaunegf_tpu.parallel.mesh import energy_mesh, local_device_count  # noqa: F401
