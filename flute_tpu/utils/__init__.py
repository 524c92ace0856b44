from flute_tpu.utils.benchmark import bench_op

__all__ = ["bench_op"]
