from entity_resolution_engine_ray.api.server import UESApiServer, openapi_schema

__all__ = ["UESApiServer", "openapi_schema"]
