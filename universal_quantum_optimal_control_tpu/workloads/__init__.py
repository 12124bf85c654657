from . import (  # noqa: F401
    run,
    dcrab_single_qubit,
    grape_single_qubit,
    two_qubit,
    universal_single_qubit,
)
