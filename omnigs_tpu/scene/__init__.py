from omnigs_tpu.scene.keyframe import Keyframe  # noqa: F401
from omnigs_tpu.scene.scene import Scene  # noqa: F401
