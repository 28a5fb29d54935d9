from . import molding  # noqa: F401
