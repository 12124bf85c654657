from . import checkpoint, metrics, trainer  # noqa: F401

from .checkpoint import restore_checkpoint, save_checkpoint  # noqa: F401
from .metrics import MetricsLogger  # noqa: F401
from .trainer import (  # noqa: F401
    CurriculumBand,
    TrainConfig,
    Trainer,
    default_curriculum,
)
from .systems import SU2System, SU4System, make_objective  # noqa: F401
from .resume import TrainState, restore_train_state, save_train_state  # noqa: F401
