from .catalog import SqlWarehouse, Warehouse, load_testdata, register_testdata_views
from .delta_snapshot import read_delta_snapshot

__all__ = [
    "SqlWarehouse",
    "Warehouse",
    "load_testdata",
    "register_testdata_views",
    "read_delta_snapshot",
]
