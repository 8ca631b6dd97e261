from recover_spark.schemas.registry import SchemaRegistry, parse_type

__all__ = ["SchemaRegistry", "parse_type"]
