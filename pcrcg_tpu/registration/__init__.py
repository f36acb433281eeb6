from pcrcg_tpu.registration.procrustes import rigid_transform  # noqa: F401
from pcrcg_tpu.registration.ransac import (  # noqa: F401
    RansacResult,
    feature_correspondences,
    ransac_pose,
    to_homogeneous,
)
from pcrcg_tpu.registration.sampling import weighted_sample_topk  # noqa: F401
