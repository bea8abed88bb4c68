"""radtxfr_tpu — TPU-native line-by-line LWIR radiative transfer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
westi024/RadTxfr: line-by-line optical depth (Voigt/Lorentz/Doppler over
HITRAN line lists with TIPS-2011 partition sums), TUD products
(transmittance / upwelling / downwelling), sensor instrument-line-shape
convolution, emissivity-weighted apparent radiance, hyperspectral scene
generation, and pod-scale sharding over a (ensemble x spectrum) device mesh.

See SURVEY.md at the repo root for the reference layer map this framework
covers, and the per-module docstrings for file:line parity citations.
"""

__version__ = "0.1.0"

from .core.planck import planckian, brightness_temperature, bt2l  # noqa: F401
from .core.grid import make_spectral_axis, arange_drift_free  # noqa: F401
