from .engine import QueryEngine  # noqa: F401
from .device_index import DeviceIndex  # noqa: F401
