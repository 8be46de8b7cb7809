from . import layers, archs, moe, convert  # noqa: F401
