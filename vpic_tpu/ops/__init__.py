from . import fields, interp, push  # noqa: F401
