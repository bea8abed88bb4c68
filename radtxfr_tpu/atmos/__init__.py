from .profile import AtmosphericState, std_atmosphere, STD_ATMOS_MOL_IDS  # noqa: F401
