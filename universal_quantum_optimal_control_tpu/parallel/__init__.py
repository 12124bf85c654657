from . import mc_parallel, mesh  # noqa: F401

from .mc_parallel import make_mean_fidelity, mean_fidelity_local  # noqa: F401
from .mesh import DATA_AXIS, MC_AXIS, make_mesh, replicated, shard_spec  # noqa: F401
