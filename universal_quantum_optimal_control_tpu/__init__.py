"""universal_quantum_optimal_control_tpu — TPU-native quantum optimal control.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``shiminki/universal_quantum_optimal_control``: robust composite-pulse
synthesis for SU(2)/SU(4) targets under static disorder, with a universal
transformer pulse model, GRAPE and dCRAB optimizers, a curriculum trainer,
and an analysis/serving layer — all designed for TPU (real-quaternion
propagators, fused Pallas kernels, mesh-sharded Monte-Carlo sampling).
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
