from .mesh import make_mesh, ENSEMBLE, SPECTRUM  # noqa: F401
from .ensemble import stack_states, tud_ensemble_sharded  # noqa: F401
from .checkpoint import EnsembleCheckpoint, run_batched  # noqa: F401
from .pallas_ensemble import make_tud_ensemble_fn, tud_ensemble_pallas  # noqa: F401
