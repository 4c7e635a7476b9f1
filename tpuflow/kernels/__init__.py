from tpuflow.kernels.coupling_ops import coupling_apply

__all__ = ["coupling_apply"]
