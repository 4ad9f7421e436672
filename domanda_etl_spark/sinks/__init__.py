from .versioned import VersionedTable, write_csv

__all__ = ["VersionedTable", "write_csv"]
