from . import staging  # noqa: F401

try:  # pragma: no cover - h5py not installed in this environment
    from . import hdf5  # noqa: F401
except ImportError:  # h5py missing
    hdf5 = None
