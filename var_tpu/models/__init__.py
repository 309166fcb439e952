from .encoders import (
    VARPretextNet,
    build_pretext_model,
    init_pretext_params,
)
from .policy import (
    Policy,
    act,
    build_policy,
    evaluate_actions,
    get_value,
)

__all__ = [
    "VARPretextNet", "build_pretext_model", "init_pretext_params",
    "Policy", "act", "build_policy", "evaluate_actions", "get_value",
]
