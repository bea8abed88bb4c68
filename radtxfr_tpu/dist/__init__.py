from .mesh import make_mesh, ENSEMBLE, SPECTRUM  # noqa: F401
from .ensemble import stack_states, tud_ensemble_sharded  # noqa: F401
from .checkpoint import EnsembleCheckpoint, run_batched  # noqa: F401
