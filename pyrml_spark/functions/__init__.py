from .registry import FunctionRegistry, default_registry  # noqa: F401
