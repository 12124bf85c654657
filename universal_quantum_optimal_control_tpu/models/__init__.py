from . import grape, pipeline, score_embedding, two_qubit, universal_transformer  # noqa: F401

from .grape import GRAPE  # noqa: F401
from .pipeline import Pipeline, rotation_vector_from_unitary  # noqa: F401
from .score_embedding import (  # noqa: F401
    euler_yxy_from_rotation_vector,
    score_features,
    score_sequence_from_yxy,
    sinusoidal_positional_encoding,
)
from .universal_transformer import (  # noqa: F401
    UniversalQOCTransformer,
    normalize_pulse_space,
    wrap_angle,
)
from .two_qubit import (  # noqa: F401
    TwoQubitQOCTransformer,
    transfer_encoder_params,
    unitary_tokens,
)
