"""Native (C++) runtime components, loaded via ctypes with pure-Python
fallbacks so the framework degrades gracefully where no toolchain exists."""

from . import io  # noqa: F401
