from gridfia_ray.kernels.registry import KernelRegistry, registry  # noqa: F401
