from pcrcg_tpu.data.pair import PairBatch, make_pair_batch, pad_cloud  # noqa: F401
