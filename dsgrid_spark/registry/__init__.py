from dsgrid_spark.registry.store import RegistryStore, VersionUpdateType

__all__ = ["RegistryStore", "VersionUpdateType"]
