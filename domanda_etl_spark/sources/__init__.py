from .extractors import Extractor
from .parquet import TPCH_TABLES, load_table, load_tables, register_views

__all__ = ["Extractor", "TPCH_TABLES", "load_table", "load_tables", "register_views"]
