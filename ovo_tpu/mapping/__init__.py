from .map_state import MapState, map_insert_frame, init_map_state  # noqa: F401
from .instances import InstanceStore, init_instance_store  # noqa: F401
