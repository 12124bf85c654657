from . import dcrab  # noqa: F401

from .dcrab import (  # noqa: F401
    DcrabConfig,
    average_infidelity,
    build_phi,
    dcrab_optimize,
    optimize_dcrab_grad,
    optimize_dcrab_nm,
    propagate_phase_control,
)
