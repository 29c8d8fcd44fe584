from zigma_tpu.transport.path import GVPCPlan, ICPlan, VPCPlan, expand_t_like_x
from zigma_tpu.transport.integrators import odeint_dopri5, odeint_fixed, sdeint
from zigma_tpu.transport.transport import (
    ModelType,
    PathType,
    Sampler,
    Transport,
    WeightType,
    create_transport,
    mean_flat,
)

__all__ = [
    "GVPCPlan",
    "ICPlan",
    "VPCPlan",
    "expand_t_like_x",
    "odeint_dopri5",
    "odeint_fixed",
    "sdeint",
    "ModelType",
    "PathType",
    "Sampler",
    "Transport",
    "WeightType",
    "create_transport",
    "mean_flat",
]
