"""Training layer: mesh/sharding, windowed-BPTT NLL step, trainer,
Orbax checkpointing (SURVEY.md L4 + §5 distributed/checkpoint rows)."""

from tpuflow.train.mesh import make_mesh, data_sharding, replicated_sharding
from tpuflow.train.step import make_train_step, window_bpd_fn
from tpuflow.train.checkpoint import Checkpointer
from tpuflow.train.trainer import Trainer

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "make_train_step",
    "window_bpd_fn",
    "Checkpointer",
    "Trainer",
]
