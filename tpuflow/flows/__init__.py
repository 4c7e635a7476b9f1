from tpuflow.flows.actnorm import ActNorm
from tpuflow.flows.inv1x1 import InvConv1x1LU
from tpuflow.flows.coupling import AffineCoupling, DenseBlockNet
from tpuflow.flows.squeeze import squeeze2d, unsqueeze2d
from tpuflow.flows.split import ConditionalSplit, ConditionalPrior
from tpuflow.flows.prior import gaussian_logp, gaussian_sample

__all__ = [
    "ActNorm",
    "InvConv1x1LU",
    "AffineCoupling",
    "DenseBlockNet",
    "squeeze2d",
    "unsqueeze2d",
    "ConditionalSplit",
    "ConditionalPrior",
    "gaussian_logp",
    "gaussian_sample",
]
