from .catalog import SnapshotCatalog  # noqa: F401
