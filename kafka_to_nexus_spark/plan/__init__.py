from .model import Attribute, Link, Plan, StartMessage, StaticDataset, StreamBinding  # noqa: F401
from .nexus_structure import build_plan  # noqa: F401
