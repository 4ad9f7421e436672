from .jdbc import read_jdbc, write_jdbc
from .versioned import VersionedTable, write_csv

__all__ = ["VersionedTable", "read_jdbc", "write_csv", "write_jdbc"]
