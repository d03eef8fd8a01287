from omnigs_tpu.ops import sh, covariance  # noqa: F401
