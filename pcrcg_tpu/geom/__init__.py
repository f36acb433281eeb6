from pcrcg_tpu.geom import se3, so3  # noqa: F401
from pcrcg_tpu.geom.kernel_points import kernel_dispositions, layer_kernel_points  # noqa: F401
