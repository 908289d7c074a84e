from . import io  # noqa: F401
from .seeding import setup_seed  # noqa: F401
