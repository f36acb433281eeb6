from pcrcg_tpu.parallel.mesh import make_mesh, replicate, shard_pair_batch  # noqa: F401
