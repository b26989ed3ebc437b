from . import hdf5, hdf5lib, staging  # noqa: F401
