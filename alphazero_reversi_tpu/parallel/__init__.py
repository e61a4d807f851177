from . import dp, mesh  # noqa: F401
