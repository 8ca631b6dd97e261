from recover_spark.schemas.registry import (
    SchemaRegistry,
    load_default_registry,
    parse_type,
)

__all__ = ["SchemaRegistry", "load_default_registry", "parse_type"]
