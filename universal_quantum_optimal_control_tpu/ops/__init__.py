from .propagate_pallas import mean_fidelity_pallas, propagate_mc_pallas  # noqa: F401
from .propagate_su4_pallas import (  # noqa: F401
    mean_fidelity_su4_pallas,
    propagate_su4_mc_pallas,
)
