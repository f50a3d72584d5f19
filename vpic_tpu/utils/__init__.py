from . import profile  # noqa: F401
