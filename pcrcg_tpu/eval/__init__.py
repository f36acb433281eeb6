from pcrcg_tpu.eval.benchmark_3dmatch import (  # noqa: F401
    BenchmarkResult,
    benchmark,
    evaluate_registration,
    read_trajectory,
    read_trajectory_info,
    transformation_error,
    write_trajectory,
)
