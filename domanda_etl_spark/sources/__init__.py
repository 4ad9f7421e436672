from .parquet import load_table, load_tables, register_views, TPCH_TABLES

__all__ = ["load_table", "load_tables", "register_views", "TPCH_TABLES"]
