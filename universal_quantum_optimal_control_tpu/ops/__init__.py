from .propagate_pallas import mean_fidelity_pallas, propagate_mc_pallas  # noqa: F401
