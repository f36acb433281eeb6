from pcrcg_tpu.ops.masked import PAD_COORD, masked_instance_norm, pad_gather  # noqa: F401
from pcrcg_tpu.ops.neighbors import radius_search  # noqa: F401
from pcrcg_tpu.ops.subsample import grid_subsample  # noqa: F401
from pcrcg_tpu.ops.pyramid import Pyramid, build_pyramid  # noqa: F401
