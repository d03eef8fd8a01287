from omnigs_tpu.model.gaussians import GaussianModel  # noqa: F401
