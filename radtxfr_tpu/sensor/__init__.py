from .ils import ils_mako, ils_matrix, apply_ils, mako_wavelengths_um  # noqa: F401
from .resolution import smooth, reduce_resolution, reduce_operator, ReduceOperator  # noqa: F401
