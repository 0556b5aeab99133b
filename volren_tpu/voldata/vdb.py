"""OpenVDB (.vdb) reader — implemented in vdb_reader.py, re-exported here."""

from .vdb_reader import read_vdb

__all__ = ["read_vdb"]
