from pcrcg_tpu.models.kpconv import KPConv, kpconv  # noqa: F401
from pcrcg_tpu.models.kpfcnn import KPFCNN, plan_architecture  # noqa: F401
from pcrcg_tpu.models.gcn import GCN  # noqa: F401
